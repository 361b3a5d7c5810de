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
    # coalesce: sum() over ZERO groups (empty/fully-unlabeled input) is
    # NULL, and the 0/0->0.0 guards downstream never fire on NULL
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .agg(
            F.coalesce(F.expr("sum((n * (n - 1)) div 2)"), F.lit(0))
            .cast("long")
            .alias(out)
        )
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


def blocking_quality(
    records: DataFrame, candidates: DataFrame, truth: DataFrame
) -> DataFrame:
    """Blocking-scheme quality card (the two standard indexing metrics,
    Christen 2012): reduction ratio = 1 − |candidates| / C(n,2) — how
    much of the quadratic comparison space the blocking eliminated —
    and pairs completeness = |candidates ∩ truth| / |truth| — how much
    recall it kept. ``candidates`` and ``truth`` are (id1, id2) with
    id1 < id2.

    Evaluating blocking by materializing C(n,2) is exactly what blocking
    exists to avoid; here every input is aggregated to a 1-row count
    (map-side combinable) and the only pairwise work is the
    candidates ∩ truth equi-join on the (id1, id2) key — |truth| rows at
    most. Exact int64 arithmetic; the two ratios are single divisions.
    """
    n = records.agg(F.count("*").alias("n_records"))
    c = candidates.agg(F.count("*").alias("n_candidates"))
    t = truth.agg(F.count("*").alias("n_true"))
    cov = (
        truth.join(candidates, ["id1", "id2"])
        .agg(F.count("*").alias("n_covered"))
    )
    one = n.crossJoin(c).crossJoin(t).crossJoin(cov)
    poss = F.expr("CAST(n_records AS BIGINT) * (n_records - 1) DIV 2")
    return one.select(
        "n_records",
        poss.alias("n_possible"),
        "n_candidates",
        "n_true",
        "n_covered",
        F.round(
            # guard: <=1 record means 0 possible pairs (ANSI divide-by-
            # zero otherwise); an undefined ratio is NULL, not a crash
            F.when(
                poss > 0,
                1 - F.col("n_candidates").cast("double") / poss,
            ),
            6,
        ).alias("reduction_ratio"),
        F.round(
            F.when(
                F.col("n_true") > 0,
                F.col("n_covered").cast("double") / F.col("n_true"),
            ),
            6
        ).alias("pairs_completeness"),
    )
