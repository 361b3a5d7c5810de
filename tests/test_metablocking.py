"""cbs_weighted_pairs / weighted_edge_pruning (operators/metablocking.py)."""

from __future__ import annotations

from dedupe_spark.operators.metablocking import (
    cbs_weighted_pairs,
    weighted_edge_pruning,
)

# record -> blocks: (1,2) share a+b, (1,3) share a, (2,3) share a,
# (4,5) share c; block d is a mega-block (records 6..120)
BLOCKS = (
    [(1, "a"), (2, "a"), (3, "a"), (1, "b"), (2, "b"), (4, "c"), (5, "c")]
    + [(i, "d") for i in range(6, 121)]
)


def test_cbs_weights(spark):
    df = spark.createDataFrame(BLOCKS, "record_id long, bk string")
    got = {
        (r["id1"], r["id2"]): r["cbs"]
        for r in cbs_weighted_pairs(df, max_block=100).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1, (4, 5): 1}


def test_mega_block_dropped(spark):
    df = spark.createDataFrame(BLOCKS, "record_id long, bk string")
    pairs = {
        (r["id1"], r["id2"])
        for r in cbs_weighted_pairs(df, max_block=100).collect()
    }
    assert not any(i1 >= 6 for i1, _ in pairs)  # block d (115 recs) gone
    # raising the cap admits it
    n_with = cbs_weighted_pairs(df, max_block=200).count()
    assert n_with == 4 + 115 * 114 // 2


def test_wep_keeps_strictly_above_mean(spark):
    df = spark.createDataFrame(BLOCKS, "record_id long, bk string")
    w = cbs_weighted_pairs(df, max_block=100)
    # weights are [2,1,1,1] -> mean 1.25 -> only the cbs=2 edge survives
    kept = weighted_edge_pruning(w).collect()
    assert {(r["id1"], r["id2"], r["cbs"]) for r in kept} == {(1, 2, 2)}
