"""Z-order (Morton curve) layout + file-skipping statistics.

The data-layout lever behind Delta/Iceberg ``OPTIMIZE ZORDER BY``: at
100 TB the cheapest scan is the one that never happens, and min/max
zone maps only prune multi-dimensional predicates if rows with nearby
values in EVERY dimension are stored together. Interleaving the bits of
two sort keys (Morton 1966) gives a 1-d order with that property; tiles
of the z-curve have bounded extent in both dimensions, so a 2-d box
predicate can skip most tiles, where a layout sorted by either single
column prunes only that column.

Everything here is exact int64 bit arithmetic (shift/and/or), so the
z-values, the per-tile zone maps AND the skip verdicts are re-derivable
bit-for-bit in the DuckDB twin — the pruning claim is value-checked,
not narrated. The tile stats aggregation is one map-side-combinable
groupBy on ``z >> tile_shift``; nothing is globally sorted (a real
OPTIMIZE would range-partition by z; the zone-map math is identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16  # per-dimension width: dims must fit in [0, 2^16)


def z_value(a: Column, b: Column, bits: int = BITS) -> Column:
    """Morton interleave: bit j of ``a`` -> bit 2j, of ``b`` -> 2j+1."""
    terms = None
    one = F.lit(1).cast("long")
    for j in range(bits):
        ta = F.shiftleft(
            F.shiftright(a.cast("long"), j).bitwiseAND(one), 2 * j
        )
        tb = F.shiftleft(
            F.shiftright(b.cast("long"), j).bitwiseAND(one), 2 * j + 1
        )
        t = ta + tb
        terms = t if terms is None else terms + t
    return terms


def z_value_sql(a: str, b: str, bits: int = BITS) -> str:
    """DuckDB twin of z_value (same shifts, same adds)."""
    parts = []
    for j in range(bits):
        parts.append(f"(((CAST({a} AS BIGINT) >> {j}) & 1) << {2 * j})")
        parts.append(f"(((CAST({b} AS BIGINT) >> {j}) & 1) << {2 * j + 1})")
    return "(" + " + ".join(parts) + ")"


def zorder_tile_stats(
    df: DataFrame,
    a: str,
    b: str,
    tile_shift: int,
    box: tuple[int, int, int, int],
) -> DataFrame:
    """Per-z-tile zone map + skip verdict for the 2-d box predicate
    ``a in [a_lo, a_hi] and b in [b_lo, b_hi]``.

    Returns (tile, n_rows, min_a, max_a, min_b, max_b, skip) where
    skip = 1 iff the tile's zone map proves no row can match — the exact
    decision a file-skipping scan makes from parquet footer min/max.
    """
    a_lo, a_hi, b_lo, b_hi = box
    # the interleave silently drops bits above 2^BITS — wraparound mixes
    # far-apart rows into one tile and quietly destroys the pruning (the
    # SQL twin truncates identically, so an oracle can't catch it): fail
    # loudly instead. One tiny agg job, the price of a checked operator.
    lim = 1 << BITS
    mx = df.agg(
        F.max(F.col(a).cast("long")), F.min(F.col(a).cast("long")),
        F.max(F.col(b).cast("long")), F.min(F.col(b).cast("long")),
    ).first()
    if any(v is not None and not (0 <= v < lim) for v in mx):
        raise ValueError(
            f"z_value dims must fit [0, {lim}): got {a} in "
            f"[{mx[1]}, {mx[0]}], {b} in [{mx[3]}, {mx[2]}] — "
            "scale/offset the columns first"
        )
    z = z_value(F.col(a), F.col(b))
    tiles = (
        df.where(F.col(a).isNotNull() & F.col(b).isNotNull())
        .select(
            F.shiftright(z, tile_shift).alias("tile"),
            F.col(a).cast("long").alias("_a"),
            F.col(b).cast("long").alias("_b"),
        )
        .groupBy("tile")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("_a").alias("min_a"),
            F.max("_a").alias("max_a"),
            F.min("_b").alias("min_b"),
            F.max("_b").alias("max_b"),
        )
    )
    skip = (
        (F.col("max_a") < a_lo)
        | (F.col("min_a") > a_hi)
        | (F.col("max_b") < b_lo)
        | (F.col("min_b") > b_hi)
    )
    return tiles.select(
        "tile",
        "n_rows",
        "min_a",
        "max_a",
        "min_b",
        "max_b",
        skip.cast("int").alias("skip"),
    )


def zorder_tile_stats_sql(
    table: str,
    a: str,
    b: str,
    tile_shift: int,
    box: tuple[int, int, int, int],
) -> str:
    a_lo, a_hi, b_lo, b_hi = box
    zv = z_value_sql(a, b)
    return f"""
WITH t AS (
  SELECT ({zv} >> {tile_shift}) AS tile,
         CAST({a} AS BIGINT) AS _a, CAST({b} AS BIGINT) AS _b
  FROM {table}
  WHERE {a} IS NOT NULL AND {b} IS NOT NULL
), g AS (
  SELECT tile, count(*) AS n_rows,
         min(_a) AS min_a, max(_a) AS max_a,
         min(_b) AS min_b, max(_b) AS max_b
  FROM t GROUP BY tile
)
SELECT tile, n_rows, min_a, max_a, min_b, max_b,
       CASE WHEN max_a < {a_lo} OR min_a > {a_hi}
              OR max_b < {b_lo} OR min_b > {b_hi}
            THEN 1 ELSE 0 END AS skip
FROM g
"""
