"""Bloom filter operator (operators/bloom.py): membership contract
(no false negatives, bounded false positives), mergeability, bounded
broadcastable state, and the map-side-combinable build plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.bloom import (
    WORD_BITS,
    bloom_build,
    bloom_contains,
    bloom_fpr,
    bloom_merge,
)

M_WORDS, K = 64, 5  # 2,048 bits — small enough to observe FPs


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(200).select(
        F.col("id"), F.concat(F.lit("key-"), F.col("id")).alias("k")
    )


@pytest.fixture(scope="module")
def filt(spark, keys):
    f = bloom_build(keys, "k", M_WORDS, K)
    f.cache().count()
    return f


def test_no_false_negatives(spark, keys, filt):
    got = bloom_contains(keys, "id", "k", filt, M_WORDS, K).collect()
    assert len(got) == 200
    assert all(r.maybe_seen for r in got)


def test_fpr_bounded(spark, keys, filt):
    """Disjoint probes: observed FPR in the ballpark of theory — and
    far from degenerate (not 0 state, not saturated)."""
    other = spark.range(10_000).select(
        F.col("id"), F.concat(F.lit("other-"), F.col("id")).alias("k")
    )
    got = bloom_contains(other, "id", "k", filt, M_WORDS, K).toPandas()
    observed = got.maybe_seen.mean()
    theory = bloom_fpr(200, M_WORDS, K)  # ≈ 0.022 at this load
    assert observed <= 4 * theory + 0.01
    assert observed > 0  # a loaded 2k-bit filter must show some FPs


def test_merge_equals_oneshot(spark, keys):
    half1 = keys.where(F.col("id") < 100)
    half2 = keys.where(F.col("id") >= 100)
    merged = bloom_merge(
        bloom_build(half1, "k", M_WORDS, K),
        bloom_build(half2, "k", M_WORDS, K),
    )
    oneshot = bloom_build(keys, "k", M_WORDS, K)
    a = {(r.word, r.bits) for r in merged.collect()}
    b = {(r.word, r.bits) for r in oneshot.collect()}
    assert a == b


def test_state_bounded_and_sign_safe(filt):
    rows = filt.collect()
    assert len(rows) <= M_WORDS
    for r in rows:
        assert 0 < r.bits < (1 << WORD_BITS)  # 32 used bits, never the sign


def test_null_keys(spark, filt):
    df = spark.createDataFrame(
        [(1, "key-7"), (2, None)], ["id", "k"]
    )
    got = {r.id: r.maybe_seen for r in
           bloom_contains(df, "id", "k", filt, M_WORDS, K).collect()}
    assert got == {1: True, 2: False}


def test_build_partial_aggregation(spark, keys):
    """bit_or combines map-side: the build plan must show a partial
    aggregate below the exchange (shuffle ≤ m_words rows/partition)."""
    plan = bloom_build(keys, "k", M_WORDS, K)._jdf.queryExecution().executedPlan().toString()
    agg_above_exchange = plan.split("Exchange")[0]
    assert "bit_or" in agg_above_exchange.lower()
    assert plan.lower().count("hashaggregate") >= 2
