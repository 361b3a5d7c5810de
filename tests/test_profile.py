"""profile_table (operators/profile.py): stats, sketch parity, plan."""

from __future__ import annotations

import pytest

from dedupe_spark.operators.profile import profile_table
from tests.test_sketches import ref_estimate, ref_registers


@pytest.fixture(scope="module")
def prof(spark):
    rows = [
        (1, "alpha", None),
        (2, "beta", None),
        (3, None, None),
        (4, "beta", None),
    ]
    df = spark.createDataFrame(rows, "id long, name string, ghost string")
    out = profile_table(df, ("id", "name", "ghost"))
    return {r["column"]: r for r in out.collect()}


def test_counts_and_nulls(prof):
    assert all(prof[c]["n_rows"] == 4 for c in ("id", "name", "ghost"))
    assert prof["id"]["n_null"] == 0
    assert prof["name"]["n_null"] == 1
    assert prof["ghost"]["n_null"] == 4


def test_min_max_as_strings(prof):
    assert (prof["id"]["min_val"], prof["id"]["max_val"]) == ("1", "4")
    assert (prof["name"]["min_val"], prof["name"]["max_val"]) == ("alpha", "beta")
    assert prof["ghost"]["min_val"] is None and prof["ghost"]["max_val"] is None


def test_distinct_estimates_match_reference(prof):
    assert prof["ghost"]["distinct_est"] == 0.0
    for col, items in (("id", ["1", "2", "3", "4"]), ("name", ["alpha", "beta", "beta"])):
        want = round(ref_estimate(ref_registers(items)), 6)
        assert prof[col]["distinct_est"] == pytest.approx(want, abs=1e-6)


def test_single_scan_plan(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = profile_table(d, ("doc_id", "text", "lang", "source", "n_chars"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1  # the melt feeds everything once


# ---------------------------------------------------------- FD / IND


def test_fd_discovery_counts_rederive_in_pandas(spark):
    from dedupe_spark.queries import _FD_CANDIDATES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        (r.lhs, r.rhs): r
        for r in QUERIES["fd_discovery"](spark, sf).collect()
    }
    d = spark.read.parquet(f"{sf}/customer.parquet").toPandas()
    assert set(got) == set(_FD_CANDIDATES)
    for x, y in _FD_CANDIDATES:
        dy = d.groupby(d[x].astype(str))[y].nunique()
        r = got[(x, y)]
        assert r.n_groups == len(dy)
        assert r.n_violations == int((dy - 1).sum())
        assert r.holds == (r.n_violations == 0)
    # the probe set must contain both outcomes or it proves nothing
    assert {r.holds for r in got.values()} == {True, False}


def test_ind_discovery_missing_counts_rederive_in_pandas(spark):
    from dedupe_spark.queries import _IND_CANDIDATES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        (r.lhs, r.rhs): r
        for r in QUERIES["ind_discovery"](spark, sf).collect()
    }
    import pandas as pd

    for ta, ca, tb, cb in _IND_CANDIDATES:
        a = set(
            spark.read.parquet(f"{sf}/{ta}.parquet").toPandas()[ca].astype(
                "int64"
            )
        )
        b = set(
            spark.read.parquet(f"{sf}/{tb}.parquet").toPandas()[cb].astype(
                "int64"
            )
        )
        r = got[(f"{ta}.{ca}", f"{tb}.{cb}")]
        assert r.n_distinct == len(a)
        assert r.n_missing == len(a - b)
        assert r.holds == (len(a - b) == 0)


def test_ucc_discovery_rederives_in_pandas(spark):
    from dedupe_spark.queries import _UCC_CANDIDATES, QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r["columns"]: r
        for r in QUERIES["ucc_discovery"](spark, sf).collect()
    }
    d = spark.read.parquet(f"{sf}/customer.parquet").toPandas()
    for combo in _UCC_CANDIDATES:
        key = d[list(combo)].astype(str).agg("\x01".join, axis=1)
        r = got["+".join(combo)]
        assert r["n_rows"] == len(d)
        assert r["n_distinct"] == key.nunique()
        assert r["n_dup_rows"] == len(d) - key.nunique()
        assert r["unique"] == (key.nunique() == len(d))
    assert {r["unique"] for r in got.values()} == {True, False}
