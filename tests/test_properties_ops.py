"""Property tests for the session-6 operator kernels.

Pure-Python kernels get full hypothesis sweeps; Spark paths get seeded
randomized corpora (a handful of collects, not one per example)."""

from __future__ import annotations

import random
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

from dedupe_spark.operators.em import (
    CLAMP,
    LR_CAP,
    MICRO,
    em_fit,
    fs_decisions,
)

gamma_st = st.tuples(*[st.integers(0, 1)] * 3)
hist_st = st.dictionaries(
    gamma_st, st.integers(1, 5000), min_size=1, max_size=8
).map(lambda d: list(d.items()))
prob_st = st.floats(0.001, 0.999)


@settings(max_examples=150, deadline=None)
@given(hist_st, st.integers(1, 12))
def test_em_fit_invariants(hist, iters):
    lam, m, u, post = em_fit(hist, 3, iters=iters)
    assert CLAMP <= lam <= 1 - CLAMP
    for j in range(3):
        assert CLAMP <= m[j] <= 1 - CLAMP
        assert CLAMP <= u[j] <= 1 - CLAMP
    assert set(post) == {g for g, _ in hist}
    assert all(0 <= p <= MICRO for p in post.values())


@settings(max_examples=150, deadline=None)
@given(
    hist_st,
    st.tuples(prob_st, prob_st, prob_st),
    st.tuples(prob_st, prob_st, prob_st),
)
def test_fs_decisions_budgets_and_bounds(hist, m, u):
    dec = fs_decisions(hist, 3, list(m), list(u), mu=0.01, lam_err=0.05)
    assert set(dec) == {g for g, _ in hist}

    def mass(g, ps):
        x = 1.0
        for j in range(3):
            x *= ps[j] if g[j] == 1 else 1 - ps[j]
        return int(x * MICRO + 0.5)

    u_spent = sum(mass(g, u) for g, (_, d) in dec.items() if d == "match")
    m_spent = sum(mass(g, m) for g, (_, d) in dec.items() if d == "non_match")
    assert u_spent <= 0.01 * MICRO
    assert m_spent <= 0.05 * MICRO
    assert all(-(2**63) < lr < 2**63 for lr, _ in dec.values())
    assert all(lr <= LR_CAP for lr, _ in dec.values())


def _shingles(text, n):
    w = text.split()
    if n == 1:
        return set(w)
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_ssjoin_randomized_parity(spark):
    from dedupe_spark.operators.ssjoin import set_similarity_join

    vocab = [f"w{i}" for i in range(12)]
    for seed in (7, 23, 99):
        rng = random.Random(seed)
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        n, t = rng.choice([(1, 0.4), (2, 0.3), (3, 0.5)])
        got = {
            (r["id1"], r["id2"])
            for r in set_similarity_join(df, t, n=n).collect()
        }
        sets = {
            i: _shingles(txt, n) for i, txt in rows if txt.strip()
        }
        want = set()
        for (i1, s1), (i2, s2) in combinations(sorted(sets.items()), 2):
            if not s1 or not s2:
                continue
            ov = len(s1 & s2)
            if ov / (len(s1) + len(s2) - ov) >= t:
                want.add((i1, i2))
        assert got == want, f"seed={seed} n={n} t={t}"


def test_rangejoin_randomized_parity(spark):
    from dedupe_spark.operators.rangejoin import point_in_interval_join

    for seed in (3, 17, 51):
        rng = random.Random(seed)
        pts = [(i, rng.randint(0, 500)) for i in range(60)]
        ivs = [
            (100 + i, s, s + rng.randint(0, 80))
            for i, s in enumerate(rng.randint(0, 500) for _ in range(25))
        ]
        pdf = spark.createDataFrame(pts, "pid long, p_us long")
        idf = spark.createDataFrame(ivs, "iid long, start_us long, end_us long")
        bin_w = rng.choice([1, 13, 64, 100])
        got = {
            (r["iid"], r["pid"])
            for r in point_in_interval_join(pdf, idf, bin_w).collect()
        }
        want = {
            (iid, pid)
            for iid, s, e in ivs
            if e > s
            for pid, p in pts
            if s <= p < e
        }
        assert got == want, f"seed={seed} bin={bin_w}"


def test_global_rank_randomized_parity(spark):
    from dedupe_spark.operators.snm import global_rank

    alphabet = "abzĀā中 "
    for seed in (5, 29):
        rng = random.Random(seed)
        rows = [
            (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6))))
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "id long, k string")
        got = {
            r["id"]: r["rank"]
            for r in global_rank(df, "k", "id", n_buckets=7).collect()
        }
        want = {
            i: pos
            for pos, i in enumerate(
                i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))
            )
        }
        assert got == want, f"seed={seed}"
