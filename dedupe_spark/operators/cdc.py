"""Lakehouse table-maintenance operators: CDC MERGE (upsert/delete) and
SCD2 attribute-history intervals.

The north-star pipeline maintains Iceberg-style snapshot tables
(pipeline.py checkpoints: atomic manifest commits, snapshot history,
time travel). These operators are the CONTENT side of that story — how a
new batch of changes becomes the next snapshot, and how attribute
history is kept queryable — expressed as plain DataFrame algebra so any
engine reproduces them:

- ``merge_upsert`` is ANSI/Delta/Iceberg ``MERGE INTO`` semantics
  (WHEN MATCHED UPDATE/DELETE, WHEN NOT MATCHED INSERT) with the
  latest-change-wins rule CDC feeds need (Debezium-style op streams).
- ``scd2_intervals`` is the Kimball slowly-changing-dimension type-2
  build: per-key attribute change history as [valid_from, valid_to)
  intervals with an is_current flag.

Scale shape: ``merge_upsert`` shuffles each side once on the merge key
(the change relation is usually tiny vs the snapshot — AQE broadcasts
it; the base table is never widened or exploded). ``scd2_intervals`` is
one per-key window (lag + lead), shuffling the event relation once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change batch to a snapshot: the next snapshot.

    ``changes`` carries ``key``, ``op_col`` ∈ {'I','U','D'}, ``seq_col``
    (change order within the batch) and the full payload columns of
    ``base``. Rule: for each key, the change with the greatest
    ``seq_col`` wins (ties broken by ``op_col`` descending — 'U' over
    'I' over 'D' — then deterministic; give changes unique seqs per key
    to avoid relying on it); a winning 'D' removes the row, a winning
    'I'/'U' replaces-or-inserts the payload. Base rows without a change
    pass through untouched.
    """
    payload = [c for c in base.columns]
    w = Window.partitionBy(key).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    untouched = base.join(latest.select(key), key, "left_anti")
    # null-safe: a malformed change with op NULL must behave as an
    # upsert, never as a silent delete (plain != would drop the key from
    # base via the anti-join while NULL-filtering it out of upserts)
    upserts = latest.where(~F.col(op_col).eqNullSafe("D")).select(*payload)
    return untouched.unionByName(upserts)


def scd2_intervals(
    events: DataFrame,
    key: str,
    ts_col: str,
    attr_col: str,
) -> DataFrame:
    """Kimball SCD2 history build from an event log: for each ``key``,
    the sequence of distinct ``attr_col`` regimes as
    ``(key, attr, valid_from, valid_to, is_current)`` rows —
    ``valid_to`` is NULL (open) on the current regime.

    Change points are events whose attr differs from the key's previous
    event (lag); each change point's interval closes at the NEXT change
    point (lead). Events are ordered by (ts, attr) so equal-timestamp
    events resolve deterministically.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(attr_col).asc())
    marked = events.select(key, ts_col, attr_col).withColumn(
        "_prev", F.lag(attr_col).over(w)
    )
    changes = marked.where(
        F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
    )
    w2 = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(attr_col).asc())
    return changes.select(
        key,
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().cast("int").alias("is_current"),
    )
