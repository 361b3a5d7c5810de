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
