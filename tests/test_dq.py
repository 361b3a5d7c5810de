"""Data-quality checks + Tukey-fence outliers."""

from __future__ import annotations

import pandas as pd
import pytest

import dedupe_spark.queries as Q
from dedupe_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_dq_checks_all_pass_on_clean_corpus(spark):
    rows = {r["check"]: r for r in QUERIES["dq_checks"](spark, SF).collect()}
    assert set(rows) == {
        "doc_id_unique",
        "text_not_null",
        "lang_in_domain",
        "n_chars_matches_text",
        "orderdate_in_window",
        "orders_custkey_fk",
    }
    for r in rows.values():
        assert r["passed"] and r["n_violations"] == 0 and r["n_rows"] > 0


def test_dq_checks_count_violations_on_dirty_corpus(spark):
    """Inject one violation of each documents-side class and assert the
    counts are exact (audit-grade, not sampled)."""
    dirty = spark.createDataFrame(
        [
            (1, "good text", "en", "s", 9),
            (1, "dup id", "en", "s", 6),  # doc_id_unique: 2 rows violate
            (2, None, "en", "s", 0),  # text_not_null
            (3, "x", "tlh", "s", 1),  # lang_in_domain
            (4, "abc", "en", "s", 99),  # n_chars_matches_text
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = Q._docs
    Q._docs = lambda spark_, sf_: dirty
    try:
        rows = {
            r["check"]: r for r in QUERIES["dq_checks"](spark, SF).collect()
        }
    finally:
        Q._docs = orig
    assert rows["doc_id_unique"]["n_violations"] == 2
    assert not rows["doc_id_unique"]["passed"]
    assert rows["text_not_null"]["n_violations"] == 1
    assert rows["lang_in_domain"]["n_violations"] == 1
    # the null-text row: n_chars 0 == len('') so it does not also
    # violate the length contract
    assert rows["n_chars_matches_text"]["n_violations"] == 1
    # orders-side checks still evaluate the real tables
    assert rows["orders_custkey_fk"]["passed"]


def test_value_outliers_vs_pandas(spark):
    """Exact-rank quartiles and the 1.5-IQR fence re-derived in pandas
    with the same integer arithmetic."""
    rows = {
        r["event_type"]: r
        for r in QUERIES["value_outliers"](spark, SF).collect()
    }
    ev = pd.read_parquet(SF + "/events.parquet")
    ev["cents"] = (ev.value * 100.0).round().astype("int64")
    for et, g in ev.groupby("event_type"):
        s = g.cents.sort_values().reset_index(drop=True)
        n = len(s)
        q1, q3 = int(s[(n - 1) // 4]), int(s[(3 * (n - 1)) // 4])
        r = rows[et]
        assert (r["q1_cents"], r["q3_cents"], r["n_events"]) == (q1, q3, n)
        hi = s[2 * s > 2 * q3 + 3 * (q3 - q1)]
        assert r["n_high_outliers"] == len(hi)
        assert r["outlier_cents_sum"] == int(hi.sum())
        assert 0 < r["n_high_outliers"] < n  # fence bites, not everything


def test_release_gate_composes_components(spark):
    """Each gate row must re-derive from its component query, and the
    integer verdicts follow the documented thresholds."""
    from dedupe_spark.queries import (
        GATE_KANON,
        GATE_PII,
        QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    rows = {r["gate"]: r for r in QUERIES["release_gate"](spark, sf).collect()}
    assert set(rows) == {
        "dq_violations",
        "contaminated_docs",
        "heavy_dup_docs",
        "k_anon_risky_rows",
        "pii_docs",
    }
    dq = QUERIES["dq_checks"](spark, sf).collect()
    assert rows["dq_violations"]["n"] == sum(r["n_violations"] for r in dq)
    assert rows["dq_violations"]["ok"] == (rows["dq_violations"]["n"] == 0)
    contam = QUERIES["decontaminate_ngrams"](spark, sf).count()
    assert rows["contaminated_docs"]["n"] == contam
    ka = rows["k_anon_risky_rows"]
    assert ka["ok"] == (ka["n"] * GATE_KANON[1] <= ka["d"] * GATE_KANON[0])
    pii = rows["pii_docs"]
    assert pii["ok"] == (pii["n"] * GATE_PII[1] <= pii["d"] * GATE_PII[0])
    for r in rows.values():
        assert 0 <= r["n"] and r["d"] > 0


# ---------------------------------------------------------------- drift PSI


def test_drift_psi_pandas_rederivation(spark):
    import hashlib
    import math

    rows = QUERIES["drift_psi"](spark, SF).toPandas()
    d = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    is_a = d["doc_id"].map(
        lambda x: hashlib.md5(str(int(x)).encode()).hexdigest()[0] < "8"
    )
    buckets = (d["n_chars"] // 50).astype("int64")
    cells = {}
    for b, a in zip(buckets, is_a):
        ca, cb = cells.get(b, (0, 0))
        cells[b] = (ca + int(a), cb + int(not a))
    na = sum(c[0] for c in cells.values())
    nb = sum(c[1] for c in cells.values())
    nbk = len(cells)
    got = rows.set_index("bucket")
    assert set(got.index) == set(cells)
    total = 0
    for b, (ca, cb) in cells.items():
        pa = (ca + 0.5) / (na + 0.5 * nbk)
        pb = (cb + 0.5) / (nb + 0.5 * nbk)
        contrib = int(round((pa - pb) * math.log(pa / pb) * 1e6))
        assert got.loc[b, "cnt_a"] == ca and got.loc[b, "cnt_b"] == cb
        assert got.loc[b, "psi_contrib_micros"] == contrib
        total += contrib
    assert (got["psi_total_micros"] == total).all()


def test_drift_psi_properties(spark):
    rows = QUERIES["drift_psi"](spark, SF).toPandas()
    # each term (p_a - p_b) ln(p_a/p_b) is non-negative by construction
    assert (rows["psi_contrib_micros"] >= 0).all()
    assert (rows["psi_total_micros"] == rows["psi_contrib_micros"].sum()).all()
    # iid md5 halves of one corpus: well below the 0.25 drift-alert bar
    assert rows["psi_total_micros"].iloc[0] < 250_000


# ------------------------------------------------------------- l-diversity


def test_l_diversity_pandas_rederivation(spark):
    import math

    got = (
        QUERIES["l_diversity"](spark, SF)
        .toPandas()
        .set_index(["c_nationkey", "c_mktsegment"])
        .sort_index()
    )
    d = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    d["sens"] = (d["c_acctbal"] * 100.0).round(0).astype("int64") // 100000
    for (nk, seg), grp in d.groupby(["c_nationkey", "c_mktsegment"]):
        row = got.loc[(nk, seg)]
        counts = grp["sens"].value_counts()
        n = int(counts.sum())
        ent = sum(
            int(round((c / n) * math.log(n / c) * 1e6)) for c in counts
        )
        assert row["n_rows"] == n
        assert row["n_distinct"] == len(counts)
        assert row["entropy_micronats"] == ent
        assert row["l_diverse"] == (len(counts) >= 3)
    assert len(got) == d.groupby(["c_nationkey", "c_mktsegment"]).ngroups


def test_l_diversity_flags_homogeneous_groups(spark):
    rows = QUERIES["l_diversity"](spark, SF).collect()
    # homogeneous groups exist at the small fixture scale and must be
    # flagged; any 1-distinct group has exactly zero entropy
    assert any(not r.l_diverse for r in rows)
    for r in rows:
        if r.n_distinct == 1:
            assert r.entropy_micronats == 0
        assert r.n_distinct <= r.n_rows


# ------------------------------------------------------------ t-closeness


def test_t_closeness_pandas_rederivation(spark):
    got = (
        QUERIES["t_closeness"](spark, SF)
        .toPandas()
        .set_index(["c_nationkey", "c_mktsegment"])
        .sort_index()
    )
    d = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    d["sens"] = (d["c_acctbal"] * 100.0).round(0).astype("int64") // 100000
    N = len(d)
    gc = d["sens"].value_counts().sort_index()
    dom = list(gc.index)
    m = len(dom)
    for (nk, seg), grp in d.groupby(["c_nationkey", "c_mktsegment"]):
        row = got.loc[(nk, seg)]
        n = len(grp)
        cg = grp["sens"].value_counts()
        cum, sabs = 0, 0
        for v in dom:
            cum += int(cg.get(v, 0)) * N - int(gc[v]) * n
            sabs += abs(cum)
        emd = int(round(sabs / (float(n) * N * (m - 1)) * 1e6))
        assert row["n_rows"] == n and row["emd_micros"] == emd
        assert row["t_close"] == (emd <= 250_000)
        # EMD is a normalized distance: inside [0, 1]
        assert 0 <= emd <= 1_000_000
