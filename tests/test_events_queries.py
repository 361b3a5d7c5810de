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


def test_trailing_hour_activity_matches_pandas(spark):
    """RANGE-frame trailing hour: pandas re-derivation per user (inclusive
    [t-1h, t] window), plus the tie-inclusivity property — same-timestamp
    events share identical frame results regardless of intra-tie order."""
    out = (
        QUERIES["trailing_hour_activity"](spark, SF)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    ev = pd.read_parquet(SF + "/events.parquet")
    # normalize to µs regardless of the parquet's stored resolution
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["cents"] = (ev["value"] * 100.0).round(0).astype("int64")
    for _, g in ev.groupby("user_id"):
        for _, row in g.iterrows():
            in_win = g[
                (g.ts_us >= row.ts_us - 3_600_000_000) & (g.ts_us <= row.ts_us)
            ]
            assert out.loc[row.event_id, "n_trailing_1h"] == len(in_win)
            assert out.loc[row.event_id, "cents_trailing_1h"] == in_win.cents.sum()


def test_trailing_hour_tie_inclusive(spark):
    """Two events of one user at the SAME microsecond: both frames
    contain both events (RANGE, not ROWS, semantics)."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3],
                "ts": pd.to_datetime(
                    ["2024-01-01 10:00:00", "2024-01-01 10:00:00", "2024-01-01 12:00:00"]
                ),
                "user_id": [7, 7, 7],
                "value": [1.0, 2.0, 4.0],
                "event_type": ["a", "a", "a"],
                "props": ["{}", "{}", "{}"],
            }
        )
    )
    import os
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = (
        QUERIES["trailing_hour_activity"](spark, d)
        .toPandas()
        .set_index("event_id")
    )
    assert out.loc[1, "n_trailing_1h"] == 2 and out.loc[2, "n_trailing_1h"] == 2
    assert out.loc[1, "cents_trailing_1h"] == 300 == out.loc[2, "cents_trailing_1h"]
    # the 12:00 event is outside both 10:00 frames and its own frame
    # holds only itself (10:00 is 2h earlier)
    assert out.loc[3, "n_trailing_1h"] == 1 and out.loc[3, "cents_trailing_1h"] == 400
