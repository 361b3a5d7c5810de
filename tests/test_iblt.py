"""IBLT difference-digest set reconciliation (operators/iblt.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.iblt import (
    iblt_build,
    iblt_diff,
    iblt_peel,
    iblt_reconcile_sql,
)
from dedupe_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


def test_iblt_roundtrip_recovers_symmetric_difference(spark):
    # A = 0..399, B = 100..499  →  A-only 0..99 (side +1), B-only
    # 400..499 (side −1); 200 diff keys, 3×128=384 cells.
    a = spark.range(0, 400).select(F.col("id").alias("k"))
    b = spark.range(100, 500).select(F.col("id").alias("k"))
    rec = (
        iblt_peel(iblt_diff(iblt_build(a, 128), iblt_build(b, 128)), 128)
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(rec) == 200
    assert rec[rec["side"] == 1]["k"].tolist() == list(range(100))
    assert rec[rec["side"] == -1]["k"].tolist() == list(range(400, 500))


def test_iblt_identical_sets_empty_diff(spark):
    a = spark.range(0, 300).select(F.col("id").alias("k"))
    d = iblt_diff(iblt_build(a, 64), iblt_build(a, 64))
    assert d.count() == 0
    assert iblt_peel(d, 64).count() == 0


def test_iblt_overloaded_table_partial_not_crash(spark):
    # 400-key diff into a 3×16=48-cell table: cannot fully decode —
    # the contract is a decodable subset (possibly empty), no failure.
    a = spark.range(0, 400).select(F.col("id").alias("k"))
    b = spark.range(400, 800).select(F.col("id").alias("k"))
    rec = iblt_peel(iblt_diff(iblt_build(a, 16), iblt_build(b, 16)), 16)
    out = rec.toPandas()
    assert len(out) <= 800
    # whatever IS recovered must be correct
    for _, r in out.iterrows():
        if r["side"] == 1:
            assert 0 <= r["k"] < 400
        else:
            assert 400 <= r["k"] < 800


def test_iblt_sql_twin_matches_spark(spark):
    a = spark.range(0, 400).select(F.col("id").alias("k"))
    b = spark.range(100, 500).select(F.col("id").alias("k"))
    got = (
        iblt_peel(iblt_diff(iblt_build(a, 128), iblt_build(b, 128)), 128)
        .toPandas()
        .sort_values(["k", "side"])
        .reset_index(drop=True)
    )
    sql = iblt_reconcile_sql(
        "SELECT CAST(range AS BIGINT) AS k FROM range(0, 400)",
        "SELECT CAST(range AS BIGINT) AS k FROM range(100, 500)",
        128,
    )
    want = (
        duckdb.connect()
        .execute(sql)
        .df()
        .sort_values(["k", "side"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_iblt_reconcile_query_complete_at_fixture_scale(spark):
    got = (
        QUERIES["iblt_reconcile"](spark, SF)
        .toPandas()
        .sort_values(["k", "side"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    truth = (
        con.execute(
            """
        SELECT CAST(doc_id AS BIGINT) AS k, CAST(1 AS BIGINT) AS side
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '08'
        UNION ALL
        SELECT CAST(doc_id + 10000000 AS BIGINT), -1
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= 'f8'
        """
        )
        .df()
        .sort_values(["k", "side"])
        .reset_index(drop=True)
    )
    # the decode is COMPLETE at fixture scale (1,536 cells ≫ diff), so
    # the recovery equals the true symmetric difference exactly
    pd.testing.assert_frame_equal(got.astype("int64"), truth.astype("int64"))
    oracle = (
        con.execute(ORACLES["iblt_reconcile"])
        .df()
        .sort_values(["k", "side"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), oracle.astype("int64"))
