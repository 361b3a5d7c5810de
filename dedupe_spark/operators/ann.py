"""Similarity search over embedding columns (array<float>).

Two paths, per the scale playbook:

- brute_force_topk    exact cosine top-k — the correctness baseline; one
                      broadcast of the (small) query set, one scan of the
                      corpus, partial top-k per partition via window rank.
- ivf_topk            IVF (inverted-file) approximate top-k: k-means-lite
                      centroids on a driver sample, corpus partitioned by
                      nearest centroid, queries probe ``nprobe`` cells —
                      the corpus side scans only probed cells at scale.

Both return (query_id, id, cosine, rank) with rank 1..k per query,
deterministic tie-break on id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from .dedup import cosine_expr


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k of ``queries`` against ``corpus``.

    The query set is broadcast (it is small by assumption — callers with
    huge query sets should pipeline batches); the corpus is scanned once
    with the cosine computed by built-in array ops (JVM, codegen). The
    row_number window does per-partition partial top-k before the final
    per-query shuffle.
    """
    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.where(F.col("id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "id", cosine_expr("qv", "cv").alias("cosine")
    )
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# IVF: centroid assignment + probed search
# ---------------------------------------------------------------------------


def train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample: int = 2000,
    iters: int = 10,
    seed: int = 42,
    corpus_count: int | None = None,
) -> np.ndarray:
    """K-means on a driver-side sample (Lloyd's, deterministic seed).

    At 100 TB the sample is still driver-sized (n_cells * ~100 vectors is
    plenty); the expensive part — assignment — stays distributed.

    The sample is a seeded Bernoulli ``df.sample`` across the whole corpus,
    NOT ``limit(sample)``: limit takes the first rows of the first
    partitions, so on a sorted/partitioned corpus (by date, by source) the
    k-means sample would be one partition's slice and the cells would
    systematically miss the rest of the space. Pass ``corpus_count`` when
    the row count is already known to skip the sizing scan.
    """
    v = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    total = corpus_count if corpus_count is not None else v.count()
    # two-phase: Bernoulli-sample down to ~4x the target (cheap scan, no
    # shuffle), then take `sample` rows in seeded-random order — the
    # orderBy(rand).limit compiles to TakeOrderedAndProject (per-partition
    # top-n + driver merge) over only ~4*sample rows, so even when the
    # fraction saturates at 1.0 on small corpora the selection stays
    # decorrelated from partition/row order
    frac = min(1.0, (4.0 * sample) / max(total, 1))
    rows = (
        v.sample(withReplacement=False, fraction=frac, seed=seed)
        .orderBy(F.rand(seed))
        .limit(sample)
        .toPandas()
    )
    X = np.asarray(rows["v"].tolist(), dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    # k-means++ seeding (Arthur & Vassilvitskii 2007): next center drawn
    # with probability proportional to squared distance to the nearest
    # chosen one — plain random init collapses well-separated clusters
    # into shared centroids often enough to hurt IVF recall
    k = min(n_cells, len(X))
    idx = [int(rng.randint(len(X)))]
    d2 = np.sum((X - X[idx[0]]) ** 2, axis=1)
    for _ in range(1, k):
        total = float(d2.sum())
        if total <= 1e-12:
            # every remaining point coincides with a chosen center (heavy
            # exact-duplicate corpora — the norm in dedup): further centers
            # would be copies, so stop with the distinct ones found
            break
        idx.append(int(rng.choice(len(X), p=d2 / total)))
        d2 = np.minimum(d2, np.sum((X - X[idx[-1]]) ** 2, axis=1))
    cents = X[idx].copy()
    for _ in range(iters):
        sims = X @ cents.T
        assign = sims.argmax(axis=1)
        for ci in range(len(cents)):
            members = X[assign == ci]
            if len(members):
                m = members.mean(axis=0)
                cents[ci] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def fixed_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> np.ndarray:
    """Deterministic, engine-portable centroid selection: the ``n_cells``
    corpus vectors with the smallest ``md5(id)`` hex digest, unit-normalized,
    cell index = rank in that md5 order.

    No iteration and no RNG: unlike :func:`train_centroids` (k-means — a
    function of numpy's sampler, unreproducible outside this process) the
    selection is a pure function of the data, so an external oracle
    (DuckDB) can re-derive the exact cells and value-check the whole IVF
    chain end to end. The md5 ordering is a uniform permutation of the
    corpus, i.e. the classic seeded-uniform-sample coarse-quantizer init —
    recall is k-means-grade on isotropic corpora, worse on heavily
    clustered ones (use :func:`train_centroids` there; this variant's job
    is verifiability). The orderBy+limit compiles to
    TakeOrderedAndProject: per-partition top-n, driver merge — no shuffle,
    driver traffic bounded by ``n_cells`` rows per partition.
    """
    rows = (
        corpus.select(
            F.md5(F.col(id_col).cast("string")).alias("h"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy("h")
        .limit(n_cells)
        .toPandas()
    )
    X = np.asarray(rows["v"].tolist(), dtype=np.float64)
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _cell_udf(cents: np.ndarray, top: int = 1):
    """pandas UDF: vector -> nearest-centroid cell id (or array of top cells)."""
    C = cents

    @pandas_udf(IntegerType())
    def _cell(vs: pd.Series) -> pd.Series:
        X = np.asarray(vs.tolist(), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series((X @ C.T).argmax(axis=1).astype(np.int32))

    return _cell


def assign_cells(
    corpus: DataFrame, cents: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add an IVF ``cell`` column — write-time partition key at scale."""
    return corpus.withColumn(
        "cell", _cell_udf(cents)(F.col(vec_col).cast("array<double>"))
    )


def ivf_topk(
    corpus_with_cells: DataFrame,
    queries: DataFrame,
    cents: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k probing ``nprobe`` nearest cells per query.

    Queries explode to (query, probe_cell) rows; the join on cell prunes the
    corpus scan to probed cells (with cell-partitioned storage this is
    partition pruning, not a filter).
    """
    n_cells = len(cents)
    nprobe = min(nprobe, n_cells)
    C = cents

    @pandas_udf("array<int>")
    def _probes(vs: pd.Series) -> pd.Series:
        X = np.asarray(vs.tolist(), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        # stable sort: probe-order ties break on the LOWER cell id, the
        # same tie-break an ORDER BY sim DESC, cell ASC oracle applies
        order = np.argsort(-(X @ C.T), axis=1, kind="stable")[
            :, :nprobe
        ].astype(np.int32)
        return pd.Series(list(order))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("cell", F.explode(_probes("qv")))
    c = corpus_with_cells.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        "cell",
    )
    joined = c.join(F.broadcast(q), "cell")
    if not include_self:
        joined = joined.where(F.col("id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "id", cosine_expr("qv", "cv").alias("cosine")
    ).dropDuplicates(["query_id", "id"])
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# MMR diversification (re-ranking)
# ---------------------------------------------------------------------------


def mmr_rerank(
    cand: DataFrame,
    sims: DataFrame,
    k: int = 5,
    lam: tuple[int, int] = (7, 10),
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): greedily pick the next result maximizing
    ``λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)`` — the
    diversification step a retrieval pipeline runs so the top-k isn't k
    near-copies of the same best hit (in a near-dup-ridden web corpus
    the plain top-k usually IS k copies).

    Inputs: ``cand (doc_id, rel_micros)`` — the candidate pool, already
    cut to a CONTRACTUALLY BOUNDED depth (TakeOrderedAndProject top-N;
    that bound is what licenses the k-round driver loop below — each
    round is a couple of joins over ≤N-row relations, never the
    corpus); ``sims (a, b, sim_micros)`` — pairwise candidate
    similarities (≤N² rows). λ is the integer pair ``lam=(num, den)``:
    the selection score is the exact int64
    ``num·rel − (den−num)·maxsim`` (units: den×micro), so every pick
    and tie-break (score desc, doc_id asc) is engine-portable and the
    SQL twin unrolls the identical k rounds. Rank 1 is pure argmax
    relevance (empty selected set ⇒ maxsim = 0).

    Returns (rnk, doc_id, rel_micros, mmr_score) for ranks 1..k.
    """
    num, den = lam
    pen = den - num
    cand = cand.localCheckpoint(eager=True)
    sims = sims.localCheckpoint(eager=True)
    first = (
        cand.orderBy(F.col("rel_micros").desc(), F.col("doc_id").asc())
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("rnk"),
            "doc_id",
            "rel_micros",
            (F.col("rel_micros") * num).cast("long").alias("mmr_score"),
        )
    )
    selected = first.localCheckpoint(eager=True)
    for r in range(2, k + 1):
        ms = (
            sims.join(
                selected.select(F.col("doc_id").alias("b")), "b"
            )
            .groupBy("a")
            .agg(F.max("sim_micros").alias("_ms"))
        )
        scored = (
            cand.join(selected.select("doc_id"), "doc_id", "left_anti")
            .join(ms, cand.doc_id == ms.a, "left")
            .select(
                "doc_id",
                "rel_micros",
                (
                    F.col("rel_micros") * num
                    - F.coalesce(F.col("_ms"), F.lit(0)) * pen
                )
                .cast("long")
                .alias("mmr_score"),
            )
        )
        pick = (
            scored.orderBy(F.col("mmr_score").desc(), F.col("doc_id").asc())
            .limit(1)
            .select(
                F.lit(r).cast("long").alias("rnk"),
                "doc_id",
                "rel_micros",
                "mmr_score",
            )
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected
