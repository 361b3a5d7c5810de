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


def greedy_one_to_one(
    pairs: DataFrame,
    rounds: int | None = None,
    max_iter: int = 30,
    checkpoint: bool = True,
) -> DataFrame:
    """Iterated locally-dominant matching → the GREEDY weighted 1:1
    assignment over ``pairs(id_a, id_b, score)``: returns
    ``(id_a, id_b, score, match_round)`` where every id_a and id_b is
    used at most once (Preis 1999 / Manne–Bisseling: repeatedly match
    every edge that is simultaneously its id_a's best and its id_b's
    best, remove matched vertices, repeat — the parallel schedule whose
    fixed point IS the sequential greedy matching, a ½-approximation of
    the optimum that global assignment solvers can't distribute).

    The step up from :func:`mutual_best_links`: one mutual-argmax round
    leaves a's second-best unmatched even when its partner became free —
    iterating re-offers freed vertices, so cardinality only grows. A
    round is two map-side-combinable groupBy-argmaxes (min over
    struct(−score, partner id) — highest score, then smallest partner,
    a total order shared bit-for-bit with the SQL twin's row_number),
    one co-keyed join-back, and two anti-joins; no windows, so a hub id
    never serializes a task. Lineage truncated per round like the CC
    loop.

    ``rounds=None`` iterates to convergence (the remaining-edge relation
    empties — every round matches at least the globally best remaining
    edge, so termination is guaranteed). ``rounds=R`` runs exactly R
    synchronous waves — the engine-portable variant the SQL oracle
    unrolls; its result is a PREFIX of the converged matching (waves
    only append) and equals it whenever convergence needs ≤ R waves.
    """
    e = pairs.select("id_a", "id_b", F.col("score").cast("double").alias("score"))
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    matched: DataFrame | None = None
    n_rounds = rounds if rounds is not None else max_iter
    for i in range(1, n_rounds + 1):
        if rounds is None and e.isEmpty():
            break
        ba = e.groupBy("id_a").agg(
            F.min(
                F.struct((-F.col("score")).alias("ns"), F.col("id_b").alias("b"))
            ).alias("w")
        ).select("id_a", F.col("w.b").alias("id_b"))
        bb = e.groupBy("id_b").agg(
            F.min(
                F.struct((-F.col("score")).alias("ns"), F.col("id_a").alias("a"))
            ).alias("w")
        ).select(F.col("w.a").alias("id_a"), "id_b")
        m = (
            e.join(ba, ["id_a", "id_b"])
            .join(bb, ["id_a", "id_b"])
            .select("id_a", "id_b", "score", F.lit(i).alias("match_round"))
        )
        if checkpoint:
            m = m.localCheckpoint(eager=True)
        matched = m if matched is None else matched.unionByName(m)
        e = e.join(m.select("id_a"), "id_a", "left_anti").join(
            m.select("id_b"), "id_b", "left_anti"
        )
        if checkpoint:
            e = e.localCheckpoint(eager=True)
    else:
        if rounds is None and not e.isEmpty():
            raise RuntimeError(
                f"greedy_one_to_one did not converge in {max_iter} rounds"
            )
    if matched is None:
        # zero input rows (or rounds=0): empty result with the INPUT's id
        # types, not a hardcoded schema
        return e.select(
            "id_a", "id_b", "score", F.lit(0).alias("match_round")
        ).limit(0)
    return matched
