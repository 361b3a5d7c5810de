"""Sequence packing for LLM training shards: GPT-style concatenate-and-cut.

Training pipelines concatenate the token streams of consecutive documents
and slice the result into fixed-``budget`` sequences; documents straddle
sequence boundaries (GPT-2/3 data prep, "we pack documents into contexts").
The per-document placement is pure prefix-sum arithmetic over a global
document order:

    tok_start  = exclusive running sum of n_tokens in id order
    seq_id     = tok_start div budget          (first sequence touched)
    seq_offset = tok_start mod budget          (position inside it)
    seq_end    = (tok_start + n_tokens - 1) div budget   (last touched)

The only hard part at scale is the GLOBAL exclusive cumsum: a naive
``Window.orderBy(id)`` with no partitionBy collapses the whole table into
one task. :func:`prefix_sum` instead runs the classic two-phase
distributed scan — per-bucket local cumsums in parallel, plus a
driver-size table of bucket totals whose own cumsum is broadcast back —
so no stage ever sees more than ``1/n_buckets`` of the data in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["prefix_sum", "pack_sequences"]


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix",
    n_buckets: int | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order, as a
    two-phase distributed scan.

    Buckets are contiguous ``order_col`` ranges derived from the observed
    min/max (one tiny agg job) — a deterministic pure function of the
    data, so branch recomputation on task retry can never disagree
    (unlike ``repartitionByRange``'s sampled boundaries). Phase 1 cumsums
    within each bucket (``Window.partitionBy(bucket)``, parallel);
    phase 2 cumsums the ``n_buckets``-row bucket-total table (trivially
    small) and broadcast-joins the resulting offsets back. With dense ids
    buckets are balanced; at 100 TB you would bucket by a write-time
    range-partition key instead of min/max arithmetic, but the two-phase
    shape is the same.
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    oc = F.col(order_col).cast("long")
    n_rows, n_keys, n_distinct, lo, hi = df.select(
        F.count("*"),
        F.count(oc),
        F.countDistinct(oc),
        F.min(oc),
        F.max(oc),
    ).first()
    if n_rows == 0:  # empty input
        return df.withColumn(out_col, F.lit(0).cast("long"))
    # contract checks (one action, same pass as min/max): a null order key
    # would SILENTLY drop its row at the offsets join, and a duplicate
    # order key makes tied rows' prefixes partition-order-dependent —
    # both violate the determinism guarantee, so fail loudly
    if n_keys != n_rows:
        raise ValueError(
            f"prefix_sum: {n_rows - n_keys} rows have a null/non-castable "
            f"{order_col!r} order key"
        )
    if n_distinct != n_rows:
        raise ValueError(
            f"prefix_sum: {order_col!r} has duplicate values "
            f"({n_rows - n_distinct} collisions) — the order, and thus the "
            "prefix, would be nondeterministic across retries"
        )
    span = max(1, (hi - lo + n_buckets) // n_buckets)
    # materialize the bucketed relation ONCE: the window branch and the
    # bucket-totals branch would otherwise each recompute the upstream
    # (e.g. per-row tokenization) on top of the stats action above
    b = df.withColumn(
        "_bkt", ((oc - F.lit(lo)) / F.lit(span)).cast("long")
    ).localCheckpoint(eager=True)
    w_local = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn(
        "_local", F.coalesce(F.sum(value_col).over(w_local), F.lit(0)).cast("long")
    )
    # n_buckets rows: the window's single-task stage is over a tiny relation.
    w_tot = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        b.groupBy("_bkt")
        .agg(F.sum(value_col).alias("_tot"))
        .withColumn("_off", F.coalesce(F.sum("_tot").over(w_tot), F.lit(0)))
        .select("_bkt", F.col("_off").cast("long").alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_bkt", "_local", "_off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 512,
) -> DataFrame:
    """Assign every document its packed-sequence placement under a
    fixed token ``budget`` per training sequence.

    Adds ``tok_start`` (global exclusive cumsum), ``seq_id``,
    ``seq_offset``, ``seq_end`` and ``n_seqs`` (how many sequences the
    document straddles). Zero-token documents occupy no tokens and are
    pinned to ``seq_end = seq_id``. All arithmetic is integer
    (``div``/``%``), so the result is bit-stable and SQL-re-derivable.
    """
    out = prefix_sum(df, id_col, tokens_col, out_col="tok_start")
    t = F.col(tokens_col).cast("long")
    start = F.col("tok_start")
    seq_id = F.expr(f"tok_start div {budget}")
    seq_end = F.when(
        t > 0, F.expr(f"(tok_start + {tokens_col} - 1) div {budget}")
    ).otherwise(seq_id)
    return (
        out.withColumn("seq_id", seq_id.cast("long"))
        .withColumn("seq_offset", (start % budget).cast("long"))
        .withColumn("seq_end", seq_end.cast("long"))
        .withColumn("n_seqs", (F.col("seq_end") - F.col("seq_id") + 1).cast("long"))
    )
