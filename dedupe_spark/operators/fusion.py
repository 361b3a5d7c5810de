"""Truth discovery / conflict resolution across unreliable sources.

Pasternack & Roth 2010 ("Knowing What to Believe", COLING) — the "Sums"
fixpoint, the simplest member of the truth-discovery family (TruthFinder,
AccuCopy, ...): given CLAIMS (source, entity, value) where sources
disagree, jointly estimate source trustworthiness and claim belief:

    belief(e, v)  = Σ_{s asserting (e,v)} trust(s)
    trust(s)      = Σ_{(e,v) asserted by s} belief(e, v)

normalized each half-step by the global max so the fixpoint doesn't blow
up — mutually-corroborating sources rise together, a source whose claims
nobody shares decays. This is the data-fusion step a record-linkage
pipeline runs AFTER clustering: the cluster says "these rows are one
entity"; truth discovery says which conflicting field value to publish —
majority voting (assemble.canonicalize_clusters) weighted by an EARNED
per-source reliability instead of one-row-one-vote.

Engine-portable determinism (the pagerank recipe applied to another
iterative algorithm): trust/belief live in int64 MICRO-units, every
update is integer sum then ``x * 1_000_000 div max`` — one fixed chain
of exact integer ops, so the SQL twin replays every round bit-for-bit.
Overflow bound: a source's trust sum is ≤ #claims(s) × 1e6 and the
scaled numerator ≤ that × 1e6, so int64 holds while any single source
asserts < ~9.2M claims; shard the claims of mega-sources above that.

Scale shape: per round, TWO map-side-combinable key shuffles (claims ⋈
trust → (ent,val) sum; claims ⋈ belief → src sum) plus two 1-row scalar
max aggregates (broadcast) — the CC/pagerank loop discipline, with
``localCheckpoint`` per round to truncate lineage. Rounds are pinned
(default 3), not converged-to, for bounded cost and SQL parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _scale_by_max(df: DataFrame, col: str, out: str) -> DataFrame:
    """x -> x * 1e6 div max(x): the integer normalization half-step.
    The max is a 1-row scalar aggregate broadcast back (the plan-lint
    allowance pair)."""
    m = df.agg(F.max(col).alias("_m"))
    return df.crossJoin(F.broadcast(m)).select(
        *[c for c in df.columns if c != col],
        F.expr(f"({col} * {MICRO}) div _m").alias(out),
    )


def sums_truth_discovery(
    claims: DataFrame, rounds: int = 3
) -> dict[str, DataFrame]:
    """Run the Sums fixpoint over ``claims (src, ent, val)``.

    Returns {"decisions": (ent, val, belief_micros) — the argmax value
    per entity, ties broken by value ascending; "beliefs": every
    (ent, val, belief_micros); "trust": (src, trust_micros)}.
    Duplicate (src, ent, val) rows are collapsed first — a source
    restating a claim is not extra evidence.
    """
    cl = claims.select("src", "ent", "val").distinct()
    cl = cl.localCheckpoint(eager=True)
    trust = cl.select("src").distinct().select(
        "src", F.lit(MICRO).cast("long").alias("trust")
    )
    beliefs = None
    for _ in range(rounds):
        b = (
            cl.join(trust, "src")
            .groupBy("ent", "val")
            .agg(F.sum("trust").cast("long").alias("_b"))
        )
        beliefs = _scale_by_max(b, "_b", "belief_micros").localCheckpoint(
            eager=True
        )
        t = (
            cl.join(beliefs, ["ent", "val"])
            .groupBy("src")
            .agg(F.sum("belief_micros").cast("long").alias("_t"))
        )
        trust = _scale_by_max(t, "_t", "trust_micros").select(
            "src", F.col("trust_micros").alias("trust")
        ).localCheckpoint(eager=True)
    w = Window.partitionBy("ent").orderBy(
        F.col("belief_micros").desc(), F.col("val").asc()
    )
    decisions = (
        beliefs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("ent", "val", "belief_micros")
    )
    return {
        "decisions": decisions,
        "beliefs": beliefs,
        "trust": trust.select("src", F.col("trust").alias("trust_micros")),
    }
