"""Clustering evaluation: pairwise precision/recall/F1 without
materializing pairs.

The standard ER quality report compares a predicted clustering against
gold entity labels over all C(n,2) record pairs. Enumerating pairs is
O(n²); the counts factor through contingency sizes instead:

    TP         = Σ over (pred, gold) joint groups of C(n_pg, 2)
    pred_pairs = Σ over pred groups of C(n_p, 2)
    gold_pairs = Σ over gold groups of C(n_g, 2)

so three shuffles on group keys (each with map-side partial counts)
replace the quadratic join — the same trick at 100 TB, where the pair
table would be astronomically larger than the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pairwise_cluster_metrics"]


def _sum_pairs(df: DataFrame, keys: list[str], out: str) -> DataFrame:
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .agg(F.expr("sum((n * (n - 1)) div 2)").cast("long").alias(out))
    )


def pairwise_cluster_metrics(
    df: DataFrame, pred_col: str, true_col: str
) -> DataFrame:
    """One-row DataFrame: ``tp, pred_pairs, true_pairs,
    pairwise_precision, pairwise_recall, pairwise_f1`` (doubles rounded
    to 6, integer counts exact). Records with a NULL in either column
    are excluded (unlabeled)."""
    base = df.select(pred_col, true_col).where(
        F.col(pred_col).isNotNull() & F.col(true_col).isNotNull()
    )
    tp = _sum_pairs(base, [pred_col, true_col], "tp")
    pred = _sum_pairs(base, [pred_col], "pred_pairs")
    true = _sum_pairs(base, [true_col], "true_pairs")
    joined = tp.crossJoin(pred).crossJoin(true)
    # 0/0 (no same-group pairs at all) defined as 0.0 — ANSI-safe
    p = F.when(F.col("pred_pairs") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / F.col("pred_pairs")
    )
    r = F.when(F.col("true_pairs") == 0, F.lit(0.0)).otherwise(
        F.col("tp") / F.col("true_pairs")
    )
    f1 = F.when(F.col("tp") == 0, F.lit(0.0)).otherwise(2 * p * r / (p + r))
    return joined.select(
        "tp",
        "pred_pairs",
        "true_pairs",
        F.round(p, 6).alias("pairwise_precision"),
        F.round(r, 6).alias("pairwise_recall"),
        F.round(f1, 6).alias("pairwise_f1"),
    )
