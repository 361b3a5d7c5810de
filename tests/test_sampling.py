"""weighted_sample (operators/sampling.py): replica parity, bias, stability."""

from __future__ import annotations

import hashlib
import math

from dedupe_spark.operators.sampling import _U_DEN, weighted_sample


def _ref_key(i: int, w: int, tag: str = "wsamp") -> float:
    h = hashlib.md5(f"{i}|{tag}".encode()).hexdigest()
    u = (int(h[:14], 16) + 1) / _U_DEN
    return math.log(u) / max(float(w), 1.0)


def _ref_sample(rows, k):
    ranked = sorted(rows, key=lambda r: (-_ref_key(r[0], r[1]), r[0]))
    return [(i, w) for i, w in ranked[:k]]


def test_matches_python_replica(spark):
    rows = [(i, (i % 13) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "item_id long, w long")
    got = [
        (r["item_id"], r["w"])
        for r in weighted_sample(df, "item_id", "w", k=25)
        .orderBy("es_key_nanos", ascending=False)
        .collect()
    ]
    assert set(got) == set(_ref_sample(rows, 25))


def test_selection_is_weight_biased(spark):
    # 1,000 items of weight 1 vs 1,000 of weight 10: the heavy class
    # should take roughly 10/11 of a k=200 sample
    rows = [(i, 1) for i in range(1000)] + [(i, 10) for i in range(1000, 2000)]
    df = spark.createDataFrame(rows, "item_id long, w long")
    got = weighted_sample(df, "item_id", "w", k=200).collect()
    heavy = sum(1 for r in got if r["w"] == 10)
    assert heavy > 140  # expectation ~182; far above the unweighted 100


def test_partitioning_invariant(spark):
    rows = [(i, (i * 7) % 29 + 1) for i in range(800)]
    df = spark.createDataFrame(rows, "item_id long, w long")
    a = {r["item_id"] for r in weighted_sample(df.repartition(1), "item_id", "w", 30).collect()}
    b = {r["item_id"] for r in weighted_sample(df.repartition(13), "item_id", "w", 30).collect()}
    assert a == b


def test_zero_weight_floored_not_crash(spark):
    df = spark.createDataFrame([(1, 0), (2, 5)], "item_id long, w long")
    got = weighted_sample(df, "item_id", "w", k=2).collect()
    assert {r["item_id"] for r in got} == {1, 2}
