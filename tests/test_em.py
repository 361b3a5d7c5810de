"""EM Fellegi-Sunter fit (operators/em.py): recovery, invariants, wiring."""

from __future__ import annotations

import pytest

from dedupe_spark.operators.em import MICRO, em_fit, em_posterior_scores


M_TRUE = (0.9, 0.8, 0.85)
U_TRUE = (0.2, 0.1, 0.15)


def _mixture_hist():
    """Planted 2-class mixture over THREE fields (k=2 is the textbook
    non-identifiable case: 5 parameters, 3 degrees of freedom): 2,000
    matches, 18,000 non-matches, expected pattern counts."""
    hist = {}
    for g0 in (0, 1):
        for g1 in (0, 1):
            for g2 in (0, 1):
                n_m = 2000.0
                n_u = 18000.0
                for g, m, u in zip((g0, g1, g2), M_TRUE, U_TRUE):
                    n_m *= m if g else 1 - m
                    n_u *= u if g else 1 - u
                hist[(g0, g1, g2)] = int(round(n_m + n_u))
    return list(hist.items())


def test_em_recovers_planted_mixture():
    lam, m, u, post = em_fit(_mixture_hist(), k=3, iters=50)
    assert 0.05 < lam < 0.2  # true mixing weight 0.1
    for j in range(3):
        assert m[j] > u[j]
        assert abs(m[j] - M_TRUE[j]) < 0.1 and abs(u[j] - U_TRUE[j]) < 0.1
    # full agreement must look like a match, full disagreement must not
    assert post[(1, 1, 1)] > 0.9 * MICRO
    assert post[(0, 0, 0)] < 0.1 * MICRO


def test_posteriors_bounded_and_monotone():
    _, _, _, post = em_fit(_mixture_hist(), k=3, iters=5)
    assert all(0 <= p <= MICRO for p in post.values())
    assert post[(1, 1, 1)] > post[(1, 1, 0)] > post[(0, 0, 0)]


def test_spark_wiring_matches_pure_fit(spark):
    hist = _mixture_hist()
    rows = []
    rid = 0
    for (g0, g1, g2), cnt in hist:
        for _ in range(cnt):
            rows.append((rid, g0, g1, g2))
            rid += 1
    df = spark.createDataFrame(rows, "pair_id long, g_a int, g_b int, g_c int")
    out = em_posterior_scores(df, ("g_a", "g_b", "g_c"))
    got = {
        (r["g_a"], r["g_b"], r["g_c"]): r["posterior_micros"]
        for r in out.select("g_a", "g_b", "g_c", "posterior_micros")
        .distinct()
        .collect()
    }
    _, _, _, want = em_fit(hist, k=3, iters=5)
    assert got == want
    assert out.count() == len(rows)  # every pair scored


def test_too_many_fields_raises(spark):
    df = spark.createDataFrame([(1,) * 10], ", ".join(f"g{i} int" for i in range(10)))
    with pytest.raises(ValueError):
        em_posterior_scores(df, tuple(f"g{i}" for i in range(10)))


def test_driver_query_separates_truth(spark):
    from dedupe_spark.queries import q_em_match_probability

    out = q_em_match_probability(spark, "/root/testdata/sf0.001").collect()
    m = sorted(r["posterior_micros"] for r in out if r["is_match"] == 1)
    nm = sorted(r["posterior_micros"] for r in out if r["is_match"] == 0)
    assert m and nm
    med = lambda xs: xs[len(xs) // 2]  # noqa: E731
    # unsupervised fit must rank true near-dups far above the rest
    assert med(m) > med(nm) + MICRO // 4


# ---------------------------------------------------------------------------
# Theorem-II decision bands
# ---------------------------------------------------------------------------

from dedupe_spark.operators.em import _q, fs_decision_patterns, fs_decisions  # noqa: E402


def test_decisions_respect_error_budgets():
    hist = _mixture_hist()
    _, m, u, _ = em_fit(hist, k=3, iters=50)
    dec = fs_decisions(hist, 3, m, u, mu=0.01, lam_err=0.05)
    # extreme patterns land in the right bands
    assert dec[(1, 1, 1)][1] == "match"
    assert dec[(0, 0, 0)][1] == "non_match"
    # the accumulated error masses stay within budget
    def mass(g, ps):
        x = 1.0
        for j in range(3):
            x *= ps[j] if g[j] == 1 else 1 - ps[j]
        return _q(x * MICRO)
    u_spent = sum(mass(g, u) for g, (_, d) in dec.items() if d == "match")
    m_spent = sum(mass(g, m) for g, (_, d) in dec.items() if d == "non_match")
    assert u_spent <= 0.01 * MICRO
    assert m_spent <= 0.05 * MICRO


def test_decision_patterns_wiring(spark):
    hist = _mixture_hist()
    rows = []
    rid = 0
    for (g0, g1, g2), cnt in hist:
        for _ in range(cnt):
            rows.append((rid, g0, g1, g2))
            rid += 1
    df = spark.createDataFrame(rows, "pair_id long, g_a int, g_b int, g_c int")
    out = fs_decision_patterns(df, ("g_a", "g_b", "g_c"))
    got = {
        (r["g_a"], r["g_b"], r["g_c"]): (r["lr_micros"], r["decision"])
        for r in out.collect()
    }
    _, m, u, _ = em_fit(hist, k=3, iters=5)
    assert got == fs_decisions(hist, 3, m, u)
    assert sum(r["cnt"] for r in out.collect()) == len(rows)


def test_em_fit_empty_histogram():
    lam, m, u, post = em_fit([], k=3, iters=5)
    assert post == {} and len(m) == 3  # defaults back, no ZeroDivision


def test_decision_lr_capped_at_int64_safe_value():
    from dedupe_spark.operators.em import LR_CAP, fs_decisions

    # all-clamp extremes: raw ratio ((1-1e-4)/1e-4)^4 * 1e6 ~ 1e22
    hist = [((1, 1, 1, 1), 10), ((0, 0, 0, 0), 1000)]
    m = [1 - 1e-4] * 4
    u = [1e-4] * 4
    dec = fs_decisions(hist, 4, m, u)
    lrs = [lr for lr, _ in dec.values()]
    assert max(lrs) == LR_CAP  # capped, not overflowed
    assert all(-(2**63) < lr < 2**63 for lr in lrs)


def test_match_calibration_separates_and_accounts_every_pair(spark):
    """The top posterior decile must contain ALL the true matches the
    blocked relation has, and bin counts must tile the scored pairs."""
    from dedupe_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    cal = QUERIES["match_calibration"](spark, sf).toPandas()
    scored = QUERIES["em_match_probability"](spark, sf).toPandas()
    assert cal["n_pairs"].sum() == len(scored)
    assert cal["n_matches"].sum() == scored["is_match"].sum() > 0
    top = cal.loc[cal["bin"].idxmax()]
    rest = cal[cal["bin"] != cal["bin"].max()]
    # observed rate in the top bin strictly exceeds every other bin's
    assert (top["obs_rate_micros"] > rest["obs_rate_micros"]).all()
    # integer identities
    for _, r in cal.iterrows():
        assert 0 <= r["obs_rate_micros"] <= 1_000_000
        assert r["n_matches"] <= r["n_pairs"]
