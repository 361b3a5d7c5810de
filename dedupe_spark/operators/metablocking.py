"""Meta-blocking: CBS edge weighting + weighted-edge pruning.

Papadakis et al., "Meta-Blocking: Taking Entity Resolution to the Next
Level" (TKDE 2014): when a dirty/over-blocked configuration emits many
redundant candidate pairs (several weak predicates, token blocking,
…), treat the block collection as a graph — records are nodes, each
co-occurrence in a block adds evidence to an edge — and prune the edges
the evidence doesn't support instead of comparing them. CBS (common
blocks scheme) weights an edge by the number of distinct blocks the
pair shares; WEP (weighted edge pruning) discards edges at or below the
mean weight. The point at 100 TB: comparisons cost an Arrow-scored
shuffle each, while weights cost one map-side-combinable count — trade
a count for a comparison.

Both stages are exact integer relational algebra: the per-block pair
expansion is capped the same way candidate generation is (a mega-block
would be quadratic before weighting could save it), the weight is a
count, the WEP threshold is one division of two int64 sums — so the
whole pipeline is value-reproducible in the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cbs_weighted_pairs(
    blocks: DataFrame,
    id_col: str = "record_id",
    bk_col: str = "bk",
    max_block: int = 100,
) -> DataFrame:
    """(id1, id2, cbs): candidate pairs weighted by the number of
    distinct blocks both records share. Blocks above ``max_block`` are
    dropped before the self-join (the standard block-purging cap —
    weighting cannot rescue a quadratic expansion that already ran)."""
    sizes = blocks.groupBy(bk_col).agg(F.count("*").alias("_bs"))
    kept = blocks.join(sizes, bk_col).where(F.col("_bs") <= max_block)
    l = kept.select(bk_col, F.col(id_col).alias("id1"))
    r = kept.select(bk_col, F.col(id_col).alias("id2"))
    return (
        l.join(r, bk_col)
        .where(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.countDistinct(bk_col).cast("long").alias("cbs"))
    )


def weighted_edge_pruning(weighted: DataFrame, w_col: str = "cbs") -> DataFrame:
    """WEP: keep edges STRICTLY above the mean weight. The mean is
    sum/count of exact int64s (one division — engine-portable; avg()
    accumulates incrementally and is not), broadcast back as a 1-row
    cross join so pruning is a pure filter projection."""
    stats = weighted.agg(
        F.sum(w_col).alias("_sw"), F.count("*").alias("_nw")
    )
    return (
        weighted.crossJoin(F.broadcast(stats))
        .where(
            F.col(w_col).cast("double")
            > F.col("_sw").cast("double") / F.col("_nw")
        )
        .drop("_sw", "_nw")
    )
