"""Point-in-interval range join via integer binning.

Spark has no native range-join operator: a raw
``points JOIN intervals ON p BETWEEN start AND end`` has no equi-key, so
Catalyst plans BroadcastNestedLoopJoin — O(|points|·|intervals|) work
and a broadcast of a whole side, the first thing that dies at 100 TB.
This operator is the bin-based rewrite (the same strategy behind
Databricks' range-join optimization and Flink's interval join): map each
point to ONE integer bin ``floor(p / bin)``, explode each interval to
the (few) bins it overlaps, equi-join on the bin, then apply the exact
range predicate. Every true (interval, point) pair meets in exactly the
point's bin — at most once, so no dedup pass is needed — and the join is
a plain shuffled hash/sort-merge equi-join that partitions, skew-splits
(AQE) and scales like any other key join.

Bin sizing: an interval [s, e) explodes to ``(e-1-s)//bin + 1 .. +2``
bins, so pick bin ≈ the typical interval length — intervals then emit
≤ 2 rows each while bins stay selective. All bin arithmetic is int64
(microseconds via unix_micros/epoch_us), bit-identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    bin_width: int,
    point_col: str = "p_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """All (interval columns..., point columns...) with
    start <= p < end (half-open, so touching intervals never double-count
    a boundary point). Columns of both inputs are preserved; the caller
    guarantees disjoint names. Null points/bounds are dropped.
    """
    w = F.lit(int(bin_width)).cast("long")
    pts = points.where(F.col(point_col).isNotNull()).withColumn(
        "_bin", F.floor(F.col(point_col) / w).cast("long")
    )
    ivs = (
        intervals.where(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (F.col(end_col) > F.col(start_col))
        )
        .withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / w).cast("long"),
                    F.floor((F.col(end_col) - 1) / w).cast("long"),
                )
            ),
        )
    )
    return (
        ivs.join(pts, "_bin")
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_bin")
    )
