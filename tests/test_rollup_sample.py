"""rollup_stats + stratified_sample query semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rollup(spark):
    return QUERIES["rollup_stats"](spark, SF).collect()


def test_rollup_grains_consistent(spark, rollup):
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    total = [r for r in rollup if r["gid"] == 3]
    assert len(total) == 1 and total[0]["n_docs"] == n
    lang_rows = [r for r in rollup if r["gid"] == 1]  # lang grain
    assert sum(r["n_docs"] for r in lang_rows) == n
    leaf = [r for r in rollup if r["gid"] == 0]
    assert sum(r["n_docs"] for r in leaf) == n
    # subtotal rows carry NULL in the rolled-up dimension
    assert all(r["source"] is None for r in lang_rows)


def test_rollup_is_single_pass(spark):
    plan = (
        QUERIES["rollup_stats"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1  # one Expand feeds one aggregation


def test_stratified_sample_bounds_and_determinism(spark):
    a = QUERIES["stratified_sample"](spark, SF).collect()
    per = {}
    for r in a:
        per.setdefault((r["lang"], r["source"]), []).append(r["doc_id"])
    assert all(len(v) <= 5 for v in per.values())
    b = QUERIES["stratified_sample"](spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # md5 order actually scrambles: some stratum's sample is not simply
    # its 5 smallest doc_ids
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lows = {
        (r["lang"], r["source"]): r["low"]
        for r in docs.groupBy("lang", "source")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .select("lang", "source", F.slice("ids", 1, 5).alias("low"))
        .collect()
    }
    assert any(sorted(per[k]) != sorted(lows[k]) for k in per)


def test_cube_has_all_four_grains(spark):
    from dedupe_spark.queries import QUERIES

    rows = QUERIES["cube_stats"](spark, "/root/testdata/sf0.001").collect()
    gids = {r["gid"] for r in rows}
    assert gids == {0, 1, 2, 3}  # detail, lang-only, source-only, total
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1 and total[0]["n_docs"] == 500
    # source-only subtotals are the grain rollup cannot produce
    assert sum(1 for r in rows if r["gid"] == 2) >= 10


def test_even_shards_are_balanced_and_total(spark):
    from dedupe_spark.queries import N_SHARDS, QUERIES

    rows = QUERIES["even_shards"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == N_SHARDS
    sizes = [r["n_docs"] for r in rows]
    assert sum(sizes) == 500
    assert max(sizes) - min(sizes) <= 1  # the ntile balance guarantee


def test_quality_percentile_bounds_and_order(spark):
    from dedupe_spark.queries import QUERIES

    rows = QUERIES["quality_percentile"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for rs in by_lang.values():
        rs.sort(key=lambda r: (r["n_chars"], r["doc_id"]))
        assert rs[0]["pct_rank"] == 0.0
        assert rs[-1]["pct_rank"] == 1.0
        assert rs[-1]["cume"] == 1.0
        pcts = [r["pct_rank"] for r in rs]
        assert pcts == sorted(pcts)
