"""asof_join (operators/asof.py): edge semantics + merge_asof reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dedupe_spark.operators.asof import asof_join

LEFT = [
    # (event_id, user_id, ts)
    (1, 1, 5),    # before any right row -> null match
    (2, 1, 10),   # equal ts -> right row at 10 IS visible (at-or-before)
    (3, 1, 25),   # two right rows share ts=20 -> greatest event_id wins
    (4, 2, 50),   # user with no right rows at all -> null match
]
RIGHT = [
    # (event_id, user_id, ts, value)
    (100, 1, 10, 1.0),
    (101, 1, 20, 2.0),
    (102, 1, 20, 3.0),
]


@pytest.fixture(scope="module")
def joined(spark):
    l = spark.createDataFrame(LEFT, "event_id long, user_id long, ts long")
    r = spark.createDataFrame(
        RIGHT, "event_id long, user_id long, ts long, value double"
    )
    out = asof_join(
        l, r, ["user_id"], "ts", ["event_id", "value"], "event_id", suffix="_m"
    )
    return {row["event_id"]: row for row in out.collect()}


def test_all_left_rows_survive(joined):
    assert set(joined) == {1, 2, 3, 4}


def test_no_preceding_right_is_null(joined):
    assert joined[1]["event_id_m"] is None and joined[4]["event_id_m"] is None


def test_equal_ts_is_at_or_before(joined):
    assert joined[2]["event_id_m"] == 100


def test_tie_on_right_ts_takes_greatest_order(joined):
    assert joined[3]["event_id_m"] == 102 and joined[3]["value_m"] == 3.0


def test_matches_pandas_merge_asof(spark):
    rng = np.random.RandomState(7)
    lpd = pd.DataFrame(
        {
            "event_id": np.arange(400),
            "user_id": rng.randint(0, 12, 400),
            "ts": rng.randint(0, 10_000, 400).astype("int64"),
        }
    )
    rpd = pd.DataFrame(
        {
            "event_id": np.arange(1000, 1250),
            "user_id": rng.randint(0, 12, 250),
            "ts": rng.randint(0, 10_000, 250).astype("int64"),
        }
    )
    # merge_asof keeps the LAST right row among ties in sort order; sort by
    # (ts, event_id) so that is the greatest event_id — our pinned semantics
    want = pd.merge_asof(
        lpd.sort_values(["ts", "event_id"]).reset_index(drop=True),
        rpd.sort_values(["ts", "event_id"]).rename(
            columns={"event_id": "event_id_m"}
        ),
        on="ts",
        by="user_id",
        allow_exact_matches=True,
    )
    got = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        ["user_id"],
        "ts",
        ["event_id"],
        "event_id",
        suffix="_m",
    ).toPandas()
    g = got.sort_values("event_id").reset_index(drop=True)
    w = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        g["event_id_m"].astype("float"), w["event_id_m"].astype("float"),
        check_names=False,
    )


def test_single_exchange_plan(spark):
    l = spark.createDataFrame(LEFT, "event_id long, user_id long, ts long")
    r = spark.createDataFrame(
        RIGHT, "event_id long, user_id long, ts long, value double"
    )
    q = asof_join(l, r, ["user_id"], "ts", ["event_id"], "event_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # one hash-partitioning exchange on the key, no join node at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_null_ts_and_null_key_rows_never_match(spark):
    from dedupe_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 5), (2, None, 5), (3, 2, None)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(100, 1, None), (101, None, 1), (102, 2, 1)],
        "event_id long, user_id long, ts long",
    )
    out = {
        r["event_id"]: r["event_id_r"]
        for r in asof_join(
            left, right, ["user_id"], "ts", ["event_id"], "event_id"
        ).collect()
    }
    # right row 100 has NULL ts: must NOT act as -infinity for left 1
    assert out[1] is None
    # left rows with NULL key / NULL ts pass through unmatched
    assert out[2] is None
    assert out[3] is None
