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


def test_session_funnel_vs_pandas(spark):
    """Literal pandas re-derivation of the ordered funnel with strict
    after-anchor semantics; counts must be monotone non-increasing."""
    import pandas as pd

    from dedupe_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(sf + "/events.parquet")
    got = {
        r["stage"]: r["n_users"]
        for r in QUERIES["session_funnel"](spark, sf).collect()
    }
    t1 = ev[ev.event_type == "view"].groupby("user_id").ts.min()
    c = ev[ev.event_type == "click"].merge(
        t1.rename("t1"), left_on="user_id", right_index=True
    )
    t2 = c[c.ts > c.t1].groupby("user_id").ts.min()
    p = ev[ev.event_type == "purchase"].merge(
        t2.rename("t2"), left_on="user_id", right_index=True
    )
    t3 = p[p.ts > p.t2].groupby("user_id").ts.min()
    assert got == {1: len(t1), 2: len(t2), 3: len(t3)}
    assert got[1] >= got[2] >= got[3] > 0


def test_token_cooccurrence_vs_pandas(spark):
    """Joint doc counts, document frequencies and lift re-derived in
    pandas; no Python evaluation in the plan (the pair expansion is a
    JVM higher-order transform)."""
    import itertools

    import pandas as pd

    from dedupe_spark.queries import COOC_MIN_JOINT, QUERIES

    sf = "/root/testdata/sf0.001"
    q = QUERIES["token_cooccurrence"](spark, sf)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    rows = q.collect()
    docs = pd.read_parquet(sf + "/documents.parquet")
    n = len(docs)
    df_cnt: dict[str, int] = {}
    joint: dict[tuple, int] = {}
    for t in docs.itertuples():
        toks = sorted(set((t.text or "").strip().lower().split()))
        for w in toks:
            df_cnt[w] = df_cnt.get(w, 0) + 1
        for a, b in itertools.combinations(toks, 2):
            joint[(a, b)] = joint.get((a, b), 0) + 1
    expect = {
        k: v for k, v in joint.items() if v >= COOC_MIN_JOINT
    }
    got = {(r["t1"], r["t2"]): r for r in rows}
    assert set(got) == set(expect)
    for (a, b), v in expect.items():
        r = got[(a, b)]
        assert r["joint"] == v
        assert r["df1"] == df_cnt[a] and r["df2"] == df_cnt[b]
        assert abs(r["lift"] - v * n / (df_cnt[a] * df_cnt[b])) < 1e-6


def test_decayed_activity_vs_pandas(spark):
    """Integer half-life weights re-derived in pandas (bit shifts, no
    floats); newer events must dominate the score."""
    import pandas as pd

    from dedupe_spark.queries import DECAY_ANCHOR, QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["decayed_cents"], r["n_events"])
        for r in QUERIES["decayed_activity"](spark, sf).collect()
    }
    ev = pd.read_parquet(sf + "/events.parquet")
    anchor = pd.Timestamp(DECAY_ANCHOR)
    days = ((anchor - ev.ts).dt.total_seconds() // 86400).astype(int).clip(lower=0)
    cents = (ev.value * 100.0).round().astype("int64")
    w = cents.values >> days.values
    ev2 = ev.assign(w=w)
    ref = ev2.groupby("user_id").agg(dc=("w", "sum"), n=("w", "size"))
    assert got == {
        int(k): (int(r.dc), int(r.n)) for k, r in ref.iterrows()
    }


def test_value_trend_rational_consistency(spark):
    """slope_num/slope_den must be the exact integer sufficient-
    statistic combination, and the rounded slope equal their ratio;
    cross-checked against numpy's lstsq on the same (x, y) ints."""
    import numpy as np
    import pandas as pd

    from dedupe_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {r["event_type"]: r for r in QUERIES["value_trend"](spark, sf).collect()}
    ev = pd.read_parquet(sf + "/events.parquet")
    base = pd.Timestamp("2024-01-01")
    ev["x"] = ((ev.ts - base).dt.total_seconds() // 3600).astype("int64")
    ev["y"] = (ev.value * 100.0).round().astype("int64")
    for et, g in ev.groupby("event_type"):
        n, sx, sy = len(g), int(g.x.sum()), int(g.y.sum())
        sxy, sxx = int((g.x * g.y).sum()), int((g.x * g.x).sum())
        r = rows[et]
        assert r["slope_num"] == n * sxy - sx * sy
        assert r["slope_den"] == n * sxx - sx * sx
        assert abs(r["slope_cents_per_hour"] - r["slope_num"] / r["slope_den"]) < 1e-6
        np_slope = np.polyfit(g.x.astype(float), g.y.astype(float), 1)[0]
        assert abs(np_slope - r["slope_cents_per_hour"]) < 1e-3


def test_cohort_retention_vs_pandas(spark):
    """Cohort matrix re-derived in pandas; offset-0 row per cohort must
    equal the cohort size and retention is monotone-bounded by it."""
    import pandas as pd

    from dedupe_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in QUERIES["cohort_retention"](spark, sf).collect()
    }
    ev = pd.read_parquet(sf + "/events.parquet")
    base = pd.Timestamp("2024-01-01")
    ev["week"] = (
        (ev.ts - base).dt.total_seconds() // (7 * 86400)
    ).astype(int)
    uw = ev[["user_id", "week"]].drop_duplicates()
    cohort = uw.groupby("user_id").week.min().rename("cw")
    j = uw.merge(cohort, left_on="user_id", right_index=True)
    ref = (
        j.assign(off=j.week - j.cw)
        .groupby(["cw", "off"])
        .size()
        .to_dict()
    )
    assert rows == {(int(a), int(b)): int(v) for (a, b), v in ref.items()}
    sizes = {cw: n for (cw, off), n in rows.items() if off == 0}
    for (cw, off), n in rows.items():
        assert n <= sizes[cw]


# ------------------------------------------------ gap fill + interval merge


def test_gap_fill_hourly_pandas_rederivation(spark):
    rows = QUERIES["gap_fill_hourly"](spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    h = (ev["ts"].astype("int64") // 10**3) // 3_600_000_000  # ns -> us -> h
    cents = (ev["value"] * 100).round(0).astype("int64")
    g = pd.DataFrame({"user_id": ev["user_id"], "h": h, "cents": cents})
    for uid, grp in g.groupby("user_id"):
        mine = rows[rows.user_id == uid].set_index("hour_idx").sort_index()
        span = range(int(grp.h.min()), int(grp.h.max()) + 1)
        assert list(mine.index) == list(span)  # every hour present, once
        per = grp.groupby("h")
        for hr in span:
            if hr in per.groups:
                sub = per.get_group(hr)
                assert mine.loc[hr, "n_events"] == len(sub)
                assert mine.loc[hr, "value_cents"] == sub.cents.sum()
            else:
                assert mine.loc[hr, "n_events"] == 0
                assert mine.loc[hr, "value_cents"] == 0


def test_gap_fill_emits_zero_rows(spark):
    rows = QUERIES["gap_fill_hourly"](spark, SF).toPandas()
    assert (rows.n_events == 0).any()  # the corpus has real gaps
    z = rows[rows.n_events == 0]
    assert (z.value_cents == 0).all()


def test_coalesce_intervals_pandas_rederivation(spark):
    W = 1_800_000_000
    rows = QUERIES["coalesce_intervals"](spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    us = ev["ts"].astype("int64") // 10**3
    g = pd.DataFrame(
        {"user_id": ev["user_id"], "eid": ev["event_id"], "s": us}
    ).sort_values(["user_id", "s", "eid"])
    expected = []
    for uid, grp in g.groupby("user_id"):
        cur = None
        for _, r in grp.iterrows():
            s, x = int(r.s), int(r.s) + W
            if cur is None or s > cur[1]:
                if cur is not None:
                    expected.append((uid, *cur))
                cur = [s, x, 1]
            else:
                cur[1] = max(cur[1], x)
                cur[2] += 1
        expected.append((uid, *cur))
    exp = pd.DataFrame(
        expected, columns=["user_id", "start_us", "end_us", "n_merged"]
    ).sort_values(["user_id", "start_us"]).reset_index(drop=True)
    got = rows.sort_values(["user_id", "start_us"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64")
    )


def test_coalesce_intervals_properties(spark):
    rows = QUERIES["coalesce_intervals"](spark, SF).toPandas()
    # merged intervals per user are disjoint (strictly separated) and
    # each covers at least one 30-min span
    W = 1_800_000_000
    for uid, grp in rows.groupby("user_id"):
        grp = grp.sort_values("start_us")
        assert (grp.end_us - grp.start_us >= W).all()
        starts = grp.start_us.to_numpy()[1:]
        ends = grp.end_us.to_numpy()[:-1]
        assert (starts > ends).all()
    # merging actually happened somewhere
    assert (rows.n_merged > 1).any()
