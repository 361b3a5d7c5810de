"""json_extract_stats + moving_avg query semantics (events table)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedupe_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_json_extraction_stays_jvm_side(spark):
    q = QUERIES["json_extract_stats"](spark, SF)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # get_json_object, not a UDF
    rows = {r["event_type"]: r for r in q.collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ks = ev["props"].str.extract(r'"k": (\d+)')[0].astype(int)
    for et, grp in ev.assign(k=ks).groupby("event_type"):
        assert rows[et]["n_events"] == len(grp)
        assert rows[et]["sum_k"] == grp["k"].sum()
        assert rows[et]["n_high"] == int((grp["k"] > 50).sum())


def test_json_nulls_and_missing_keys(spark):
    df = spark.createDataFrame(
        [("a", '{"k": 3}'), ("b", "{}"), ("c", None), ("d", "not json")],
        "id string, props string",
    )
    got = {
        r["id"]: r["k"]
        for r in df.select(
            "id", F.get_json_object("props", "$.k").cast("long").alias("k")
        ).collect()
    }
    assert got == {"a": 3, "b": None, "c": None, "d": None}


def test_moving_avg_matches_pandas_rolling(spark):
    got = QUERIES["moving_avg"](spark, SF).toPandas()
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    cents = (ev["value"] * 100.0).round(0).astype("int64")
    want = (
        cents.groupby(ev["user_id"])
        .rolling(3, min_periods=1)
        .mean()
        .reset_index(level=0, drop=True)
        / 100.0
    ).round(6)
    merged = got.set_index("event_id")["mov_avg_3"]
    for eid, w in zip(ev["event_id"], want):
        assert merged[eid] == pytest.approx(w, abs=1e-6), eid
