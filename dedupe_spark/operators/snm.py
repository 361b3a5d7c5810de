"""Sorted-neighborhood blocking (Hernández & Stolfo 1995).

The other classic blocking family: sort the corpus by a domain key and
compare each record only to its w−1 successors in that order — near-dups
with similar keys become adjacent, and candidate volume is exactly
n·(w−1) − C(w−1+1, 2)-ish regardless of key skew (a hot key inflates a
hash BLOCK quadratically, but a sorted WINDOW stays linear: skew shifts
who the neighbors are, not how many there are).

The hard part in Spark is the global rank: ``row_number() OVER (ORDER BY
key)`` plans a single-partition window — the driver-shaped bottleneck.
:func:`global_rank` is the two-phase scan instead (same shape as
operators/packing.py:prefix_sum, generalized to STRING keys): bucket by
a numeric proxy that is monotone in the key (big-endian int of the first
4 ASCII chars, so proxy order can never disagree with key order and
equal proxies never straddle buckets), rank within buckets in parallel,
cumsum the tiny bucket-count table, broadcast the offsets back.

The neighborhood pairing then IS a range join: record at rank r pairs
with ranks (r, r+w) — point_in_interval_join (operators/rangejoin.py)
with bin = w, so every pair meets exactly once on an int64 equi-key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rangejoin import point_in_interval_join


def _key_proxy(key: Column) -> Column:
    """Big-endian base-256 int of the first 4 codepoints, TRUNCATED at
    the first codepoint ≥ 255 (that position contributes 255, every
    later position 0). Per-position clamping alone is NOT monotone —
    'Āb' vs 'āa' would invert (both first chars clamp to 255, then the
    SECOND chars decide in the wrong direction); truncation restores
    non-strict monotonicity for any unicode content: at the first
    differing position either both codepoints are < 255 (that base-256
    digit strictly decides, lower digits can't overcome it) or at least
    one is ≥ 255 (both proxies collapse to the shared-prefix value —
    equal, so the keys share a bucket and the in-bucket sort orders
    them). key1 < key2 can therefore never give proxy1 > proxy2."""
    p = F.lit(0).cast("long")
    alive = F.lit(True)
    for i in range(1, 5):
        cp = F.coalesce(F.ascii(F.substring(key, i, 1)), F.lit(0))
        digit = F.when(alive, F.least(cp, F.lit(255))).otherwise(F.lit(0))
        p = p * 256 + digit.cast("long")
        alive = alive & (cp < 255)
    return p


def global_rank(
    df: DataFrame,
    key_col: str,
    id_col: str,
    out_col: str = "rank",
    n_buckets: int | None = None,
) -> DataFrame:
    """0-based dense global rank by (key, id) — total order, no
    single-partition window. Null keys sort first (Spark and SQL
    ``ORDER BY`` agree: NULLS FIRST ascending is both engines'
    default)."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    b = df.withColumn("_pxy", _key_proxy(F.col(key_col)))
    lo, hi = b.select(F.min("_pxy"), F.max("_pxy")).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    span = max(1, (hi - lo + n_buckets) // n_buckets)
    b = b.withColumn("_bkt", ((F.col("_pxy") - F.lit(lo)) / span).cast("long"))
    w_local = Window.partitionBy("_bkt").orderBy(key_col, id_col)
    local = b.withColumn(
        "_local", (F.row_number().over(w_local) - 1).cast("long")
    )
    w_tot = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        b.groupBy("_bkt")
        .agg(F.count("*").alias("_cnt"))
        .withColumn("_off", F.coalesce(F.sum("_cnt").over(w_tot), F.lit(0)))
        .select("_bkt", F.col("_off").cast("long").alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_pxy", "_bkt", "_local", "_off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame, id_col: str, key: Column, window: int = 5
) -> DataFrame:
    """(id1, id2, gap): all pairs within ``window`` positions of each
    other in (key, id) order, 1 <= gap <= window − 1."""
    keyed = df.select(F.col(id_col).alias("_id"), key.alias("_key"))
    ranked = global_rank(keyed, "_key", "_id")
    pts = ranked.select(F.col("_id").alias("id2"), F.col("rank").alias("p_us"))
    ivs = ranked.select(
        F.col("_id").alias("id1"),
        (F.col("rank") + 1).alias("start_us"),
        (F.col("rank") + F.lit(window)).alias("end_us"),
    )
    return point_in_interval_join(pts, ivs, window).select(
        "id1", "id2", (F.col("p_us") - F.col("start_us") + 1).alias("gap")
    )
