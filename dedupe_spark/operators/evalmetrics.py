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


def bcubed_metrics(df: DataFrame, pred_col: str, true_col: str) -> DataFrame:
    """One-row DataFrame: ``n_records, p_micro_sum, r_micro_sum,
    bcubed_precision, bcubed_recall, bcubed_f1, ari`` — the B-cubed
    record-level metrics (Bagga & Baldwin 1998; the Amigó et al. 2009
    formal-constraints winner among ER evaluation measures) plus the
    Adjusted Rand Index, both from the same contingency counts as
    :func:`pairwise_cluster_metrics` — never a pair join.

    B³ factors through the (pred, true) cell sizes: a record in a cell
    of n_ct members, predicted cluster size n_c, true cluster size n_t
    contributes precision n_ct/n_c and recall n_ct/n_t, so

        B³P = (1/N) Σ_cells n_ct²/n_c      B³R = (1/N) Σ_cells n_ct²/n_t

    Engine-portable determinism: the per-cell rational n_ct²/n_c is
    quantized to integer MICRO-units before the sum (double summation is
    partition-order-dependent; int64 addition is not — the same device
    as BM25/LM scoring), so the one-row result is bit-identical in the
    SQL twin. Bound: n_ct²·10⁶ must fit int64 → the largest (pred,true)
    cell ≤ ~3.0M records; beyond that, shard the eval by true-cluster
    partition before averaging. ARI is computed from the three exact
    pair counts + C(N,2) with one fixed double expression
    (Hubert & Arabie 1985: (TP − E)/(max − E),
    E = pred_pairs·true_pairs/C(N,2)).

    Scale shape: one cell groupBy (map-side combinable) + two size
    groupBys joined back on their own keys + the two one-row aggregates
    — the same three key-local shuffles as the pairwise report.
    Records NULL in either column are excluded (unlabeled).
    """
    base = df.select(
        F.col(pred_col).alias("_p"), F.col(true_col).alias("_t")
    ).where(F.col(pred_col).isNotNull() & F.col(true_col).isNotNull())
    cells = base.groupBy("_p", "_t").agg(F.count("*").alias("n_ct"))
    nc = base.groupBy("_p").agg(F.count("*").alias("n_c"))
    nt = base.groupBy("_t").agg(F.count("*").alias("n_t"))
    j = cells.join(nc, "_p").join(nt, "_t")
    pm = F.round(
        F.col("n_ct") * F.col("n_ct") * F.lit(1000000.0) / F.col("n_c"), 0
    ).cast("long")
    rm = F.round(
        F.col("n_ct") * F.col("n_ct") * F.lit(1000000.0) / F.col("n_t"), 0
    ).cast("long")
    sums = j.agg(
        F.coalesce(F.sum(pm), F.lit(0)).cast("long").alias("p_micro_sum"),
        F.coalesce(F.sum(rm), F.lit(0)).cast("long").alias("r_micro_sum"),
        F.coalesce(
            F.sum(F.expr("(n_ct * (n_ct - 1)) div 2")), F.lit(0)
        ).cast("long").alias("tp"),
    )
    np_ = base.agg(F.count("*").alias("n_records"))
    pp = nc.agg(
        F.coalesce(F.sum(F.expr("(n_c * (n_c - 1)) div 2")), F.lit(0))
        .cast("long")
        .alias("pred_pairs")
    )
    tpairs = nt.agg(
        F.coalesce(F.sum(F.expr("(n_t * (n_t - 1)) div 2")), F.lit(0))
        .cast("long")
        .alias("true_pairs")
    )
    one = sums.crossJoin(np_).crossJoin(pp).crossJoin(tpairs)
    n = F.col("n_records")
    bp = F.when(n == 0, F.lit(0.0)).otherwise(
        F.col("p_micro_sum") / (F.lit(1000000.0) * n)
    )
    br = F.when(n == 0, F.lit(0.0)).otherwise(
        F.col("r_micro_sum") / (F.lit(1000000.0) * n)
    )
    bf = F.when(
        (F.col("p_micro_sum") == 0) | (F.col("r_micro_sum") == 0), F.lit(0.0)
    ).otherwise(2 * bp * br / (bp + br))
    tot = (n * (n - 1) / F.lit(2.0))
    e = F.col("pred_pairs") * F.col("true_pairs") / tot
    mx = (F.col("pred_pairs") + F.col("true_pairs")) / F.lit(2.0)
    ari = F.when(n < 2, F.lit(0.0)).otherwise(
        F.when(mx == e, F.lit(1.0)).otherwise(
            (F.col("tp") - e) / (mx - e)
        )
    )
    return one.select(
        "n_records",
        "p_micro_sum",
        "r_micro_sum",
        F.round(bp, 6).alias("bcubed_precision"),
        F.round(br, 6).alias("bcubed_recall"),
        F.round(bf, 6).alias("bcubed_f1"),
        F.round(ari, 6).alias("ari"),
    )
