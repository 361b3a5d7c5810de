"""Record linkage across TWO tables (RecordLink mode).

The reference app runs dedupe's Dedupe mode (within-table); the library it
wraps also ships RecordLink (A ↔ B matching across two sources, e.g. a CRM
extract against a crawl). Spark-first shape:

1. block each side with the SAME predicate library
   (:func:`~dedupe_spark.operators.blocking.generate_blocks`);
2. candidate pairs = a_blocks ⋈ b_blocks on the block key — a plain
   cross-source equi-join (no ``id1 < id2`` dedup: the sides are disjoint
   by construction), capped per side against mega-blocks exactly like the
   self-join path;
3. score with any pair scorer (the engine's
   :func:`~dedupe_spark.operators.scoring.score_pairs` or a column
   expression);
4. one-to-one matching via **mutual argmax**: a pair survives iff it is
   record a's best match AND record b's best match (deterministic
   tie-breaks) — two window ranks, no iteration, micro-batch safe; the
   standard scalable alternative to global assignment solvers, which do
   not distribute.

At 100 TB both joins shuffle on the block key / record ids only; the
mutual-argmax windows partition by each side's id — skew-free as long as
ids are unique, which they are by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .blocking import block_sizes


def cross_candidate_pairs(
    blocks_a: DataFrame,
    blocks_b: DataFrame,
    max_block: int = 500,
) -> DataFrame:
    """(id_a, id_b) pairs sharing ≥1 block key across the two sides.

    A key is dropped when EITHER side's block exceeds ``max_block`` (the
    pair blow-up is ``|a-block| × |b-block|``, so one degenerate side is
    enough to hurt) — same stop-key semantics as the self-join path.
    """
    ka = block_sizes(blocks_a).where(F.col("block_size") <= max_block).select("bk")
    kb = block_sizes(blocks_b).where(F.col("block_size") <= max_block).select("bk")
    a = blocks_a.join(ka, "bk").select("bk", F.col("record_id").alias("id_a"))
    b = blocks_b.join(kb, "bk").select("bk", F.col("record_id").alias("id_b"))
    return a.join(b, "bk").select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])


def mutual_best_links(
    scored: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str = "score",
) -> DataFrame:
    """One-to-one links: keep (a, b) iff b is a's top match and a is b's.

    Deterministic: ties break on the partner id ascending. Strict by
    design: a record whose best partner prefers someone else stays
    UNMATCHED this pass (no cascading reassignment — that is greedy
    matching, which iterates and does not distribute in one pass); callers
    wanting a weaker many-to-one join keep rank_a == 1 only.
    """
    # collapse duplicate (a, b) rows to their best score first: complete
    # ties would otherwise get independent row_number draws in the two
    # windows and a mutually-best pair could nondeterministically satisfy
    # neither _ra==1 nor _rb==1 on the same physical row
    scored = scored.groupBy(id_a, id_b).agg(
        F.max(score_col).alias(score_col)
    )
    wa = Window.partitionBy(id_a).orderBy(F.desc(score_col), F.asc(id_b))
    wb = Window.partitionBy(id_b).orderBy(F.desc(score_col), F.asc(id_a))
    return (
        scored.withColumn("_ra", F.row_number().over(wa))
        .withColumn("_rb", F.row_number().over(wb))
        .where((F.col("_ra") == 1) & (F.col("_rb") == 1))
        .drop("_ra", "_rb")
    )
