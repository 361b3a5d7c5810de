"""As-of join: each left row matched to the latest right row at-or-before
its timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB/Pandas do — the oracle uses an
explicit argmax so tie semantics are pinned, not vendor-defaulted). The
naive relational encoding is an inequality join (l.key = r.key AND
r.ts <= l.ts) + argmax — a per-key CROSS PRODUCT that explodes on hot
keys. The scale-correct plan is the union trick:

  1. tag right rows 0 and left rows 1, union them on (key, ts, tag, ord);
  2. one shuffle co-partitions by key; within each key a window ordered
     by (ts, tag, ord) computes last(payload, ignorenulls=True) over
     UNBOUNDED PRECEDING..CURRENT ROW — the latest right payload seen so
     far, i.e. exactly the as-of match;
  3. keep left rows only.

Cost: ONE exchange of |L|+|R| rows and a per-key sort — same shape as
sessionization; no pair materialization, no skew amplification (a hot
key costs its own size, never |L_key|×|R_key|).

Tie semantics (deterministic, mirrored in the SQL twin): at equal ts,
right rows sort BEFORE left rows (at-or-before semantics; pandas
merge_asof allow_exact_matches=True), and among right rows with equal ts
the one with the greatest ``right_order`` wins (they sort ascending, the
window's last() takes the latest).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    time_col: str,
    payload_cols: Sequence[str],
    right_order: str,
    suffix: str = "_r",
) -> DataFrame:
    """Left columns + latest-at-or-before right ``payload_cols`` (renamed
    with ``suffix``; NULL when no right row precedes). ``right_order``
    breaks ties among right rows sharing (key, ts) — greatest wins.

    NULL semantics (mirroring the oracle's inequality join, where a NULL
    never satisfies r.ts <= l.ts or a key equality): right rows with a
    NULL timestamp or NULL key are never match candidates (unfiltered
    they would sort NULLS FIRST and act as -infinity matches); left rows
    with NULL ts/key pass through unmatched.
    """
    from pyspark.sql.types import StructField, StructType

    lcols = left.columns
    # build the NULL-struct types as DataType objects — a DDL-string
    # round-trip breaks on column names that need quoting
    p_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    lt = left.select(
        *keys,
        F.col(time_col).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("long").alias("__ord"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(p_type).alias("__p"),
    )
    r_ok = F.col(time_col).isNotNull()
    for k in keys:
        r_ok = r_ok & F.col(k).isNotNull()
    rt = right.where(r_ok).select(
        *keys,
        F.col(time_col).alias("__t"),
        F.lit(0).alias("__tag"),
        F.col(right_order).cast("long").alias("__ord"),
        F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
        F.struct(*payload_cols).alias("__p"),
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("__t").asc(), F.col("__tag").asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lt.unionByName(rt)
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .where(F.col("__l").isNotNull())
    )
    return matched.select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        *[F.col("__m")[c].alias(f"{c}{suffix}") for c in payload_cols],
    )
