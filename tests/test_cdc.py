"""operators/cdc: MERGE upsert/delete latest-change-wins semantics, SCD2
interval building, and the streaming COW snapshot-chain replay."""

from __future__ import annotations

import datetime as dt
import os

from dedupe_spark.operators.cdc import merge_upsert, scd2_intervals

BASE_SCHEMA = "doc_id long, text string, v long"
CH_SCHEMA = "op string, seq long, doc_id long, text string, v long"


def _merge(spark, base, changes):
    b = spark.createDataFrame(base, BASE_SCHEMA)
    c = spark.createDataFrame(changes, CH_SCHEMA)
    rows = merge_upsert(b, c, "doc_id").collect()
    return {r["doc_id"]: (r["text"], r["v"]) for r in rows}


def test_merge_insert_update_delete(spark):
    base = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    changes = [
        ("U", 1, 2, "b2", 21),        # update
        ("D", 1, 3, None, None),      # delete
        ("I", 1, 4, "d", 40),         # insert new key
    ]
    got = _merge(spark, base, changes)
    assert got == {1: ("a", 10), 2: ("b2", 21), 4: ("d", 40)}


def test_merge_latest_change_wins(spark):
    base = [(1, "a", 10), (2, "b", 20)]
    changes = [
        ("D", 1, 1, None, None),
        ("U", 2, 1, "a2", 11),        # later update overrides the delete
        ("U", 1, 2, "b1", 21),
        ("D", 2, 2, None, None),      # later delete overrides the update
    ]
    got = _merge(spark, base, changes)
    assert got == {1: ("a2", 11)}


def test_merge_multiple_updates_max_seq(spark):
    base = [(1, "a", 10)]
    changes = [("U", i, 1, f"a{i}", 10 + i) for i in (1, 3, 2)]
    got = _merge(spark, base, changes)
    assert got == {1: ("a3", 13)}


def test_merge_null_op_is_upsert_not_silent_delete(spark):
    # a malformed change row with op NULL wins the seq race: it must
    # behave as an upsert (payload lands), never vanish the key — plain
    # `op != 'D'` would NULL-filter it out of upserts while the anti-join
    # still removed the base row
    base = [(1, "a", 10)]
    changes = [(None, 5, 1, "a-null-op", 11)]
    got = _merge(spark, base, changes)
    assert got == {1: ("a-null-op", 11)}


def test_merge_insert_then_delete_never_appears(spark):
    base = [(1, "a", 10)]
    changes = [("I", 1, 9, "ghost", 0), ("D", 2, 9, None, None)]
    got = _merge(spark, base, changes)
    assert got == {1: ("a", 10)}


def _ts(m):
    return dt.datetime(2026, 1, 1, 0, m)


def test_scd2_regimes(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(0), "x"),
            (1, _ts(1), "x"),   # same regime, collapses
            (1, _ts(2), "y"),
            (1, _ts(5), "x"),   # back to x = NEW regime
            (2, _ts(3), "z"),   # single-event user
        ],
        "user_id long, ts timestamp, attr string",
    )
    rows = scd2_intervals(ev, "user_id", "ts", "attr").collect()
    got = {
        (r["user_id"], r["valid_from"]): (r["attr"], r["valid_to"], r["is_current"])
        for r in rows
    }
    assert got == {
        (1, _ts(0)): ("x", _ts(2), 0),
        (1, _ts(2)): ("y", _ts(5), 0),
        (1, _ts(5)): ("x", None, 1),
        (2, _ts(3)): ("z", None, 1),
    }


def test_streaming_merge_snapshot_chain(spark, tmp_path):
    """Three seq-ordered change shards streamed one per micro-batch must
    land on the one-shot merge result, the COW chain must commit one
    snapshot per epoch, and a second replay over the same stage (nothing
    new to process) must return the same final snapshot."""
    from dedupe_spark.streaming.incremental import replay_merge_upsert

    base = spark.createDataFrame(
        [(i, f"t{i}", i * 10) for i in range(1, 7)], BASE_SCHEMA
    )
    changes = spark.createDataFrame(
        [
            ("D", 1, 2, None, None),      # shard 0: delete 2 (and 5 below)
            ("D", 1, 5, None, None),
            ("U", 2, 3, "t3v2", 31),      # shard 1: update 3, resurrect 5
            ("U", 2, 5, "t5v2", 51),
            ("I", 3, 9, "t9", 90),        # shard 2: insert new key
        ],
        CH_SCHEMA,
    )
    stage = str(tmp_path / "stage")
    ddl = "op string, seq long, doc_id long, text string, v long"

    def run():
        rows = replay_merge_upsert(
            spark, base, changes, ddl, "doc_id", stage
        ).collect()
        return {r["doc_id"]: (r["text"], r["v"]) for r in rows}

    want = {
        1: ("t1", 10),
        3: ("t3v2", 31),
        4: ("t4", 40),
        5: ("t5v2", 51),   # deleted in epoch 0, re-upserted in epoch 1
        6: ("t6", 60),
        9: ("t9", 90),
    }
    assert run() == want
    snaps = [
        d
        for d in os.listdir(os.path.join(stage, "snapshots"))
        if d.startswith("snap_")
    ]
    assert len(snaps) == 3  # one committed COW snapshot per epoch
    assert run() == want  # replay over the drained stream is a no-op


def test_scd2_equal_ts_deterministic(spark):
    # two different attrs at the same timestamp: ordered by (ts, attr)
    ev = spark.createDataFrame(
        [(1, _ts(0), "b"), (1, _ts(0), "a")],
        "user_id long, ts timestamp, attr string",
    )
    rows = sorted(
        scd2_intervals(ev, "user_id", "ts", "attr").collect(),
        key=lambda r: r["attr"],
    )
    assert [r["attr"] for r in rows] == ["a", "b"]
    assert rows[0]["is_current"] == 0 and rows[1]["is_current"] == 1
