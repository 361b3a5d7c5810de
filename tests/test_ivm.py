"""Incremental view maintenance (partial-state merge) and set-op
semantics used by queries.q_incremental_rollup / q_source_except."""

from __future__ import annotations

from pyspark.sql import functions as F


def _partial(df):
    return df.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.max("v").alias("mx"),
        F.min("v").alias("mn"),
    )


def _merge(state, delta):
    return (
        state.unionByName(delta)
        .groupBy("g")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.max("mx").alias("mx"),
            F.min("mn").alias("mn"),
        )
    )


def test_merge_state_equals_recompute(spark):
    rows = [(i % 3, i * 7 % 13) for i in range(60)]
    df = spark.createDataFrame(rows, "g int, v int")
    snapshot = df.where(F.col("v") % 2 == 0)
    delta = df.where(F.col("v") % 2 == 1)
    merged = {r["g"]: r for r in _merge(_partial(snapshot), _partial(delta)).collect()}
    full = {r["g"]: r for r in _partial(df).collect()}
    assert set(merged) == set(full)
    for g in full:
        for c in ("n", "s", "mx", "mn"):
            assert merged[g][c] == full[g][c]


def test_merge_empty_delta_is_identity(spark):
    df = spark.createDataFrame([(1, 5), (1, 7), (2, 3)], "g int, v int")
    state = _partial(df)
    empty = _partial(df.where(F.lit(False)))
    merged = {r["g"]: r for r in _merge(state, empty).collect()}
    orig = {r["g"]: r for r in state.collect()}
    assert merged.keys() == orig.keys()
    for g in orig:
        assert tuple(merged[g]) == tuple(orig[g])


def test_except_all_multiplicity(spark):
    a = spark.createDataFrame([(1,), (1,), (1,), (2,)], "x int")
    b = spark.createDataFrame([(1,), (3,)], "x int")
    got = sorted(r["x"] for r in a.exceptAll(b).collect())
    # multiset semantics: 3 ones minus 1 one = 2 ones; the 2 survives
    assert got == [1, 1, 2]
