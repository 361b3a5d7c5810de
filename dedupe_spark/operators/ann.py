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
    X = _md5_head_rows(corpus, id_col, vec_col, n_cells)
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _cell_udf(cents: np.ndarray, top: int = 1):
    """pandas UDF: vector -> nearest-centroid cell id (or array of top cells)."""
    C = cents

    @pandas_udf(IntegerType())
    def _cell(vs: pd.Series) -> pd.Series:
        X = np.asarray(vs.tolist(), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series((X @ C.T).argmax(axis=1).astype(np.int32))

    # asNondeterministic: when the cell column becomes a join key the
    # inferred isnotnull(cell) filter would otherwise re-evaluate the
    # kernel once in the filter and again in the project (the engine-wide
    # infer-filters device; values are unchanged, evaluation count is not)
    return _cell.asNondeterministic()


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

# ---------------------------------------------------------------------------
# Product quantization — ADC scan (Jegou, Douze & Schmid, PAMI 2011)
# ---------------------------------------------------------------------------
#
# The memory-compression scale path the IVF/LSH family does not cover: a
# d-dim float corpus (d*4 bytes/vector) is re-encoded as m uint8-sized
# codebook indices (m bytes/vector — 32x smaller at d=64, m=8), and the
# search scan never touches the original vectors: per query a tiny
# (m x ks) lookup table of subspace distances is built once, and the
# corpus-side Asymmetric Distance Computation is m table lookups + m adds
# per row — here expressed entirely in JVM built-ins (zip_with +
# element_at + aggregate), so the 100 TB scan side carries ZERO Python.
# At 10^12 documents the codes table is what fits in cluster RAM when the
# raw embeddings cannot.
#
# Float portability discipline (what makes the DuckDB value oracles
# exact): every reduction whose RESULT VALUE enters the quantized chain
# (norms, subspace distances, residuals) — and, in the PQ family, the
# probe decisions too — is computed as a SEQUENTIAL LEFT FOLD over the
# dimension order on both engines: numpy's pairwise/SIMD summation is
# deliberately avoided in favor of an explicit fold loop (vectorized
# across rows, folded across dims), matching DuckDB's list_sum over an
# ORDER BY-built list. The one scoped exception: the pre-existing IVF
# coarse-ASSIGN kernel (_cell_udf / fixed_centroids) keeps linalg.norm +
# matmul — only its argmax DECISIONS cross engines, robust at the
# distance gaps real corpora have (the device its committed golden
# output and three-scale hash matches were generated with).


def _sq_norms_fold(X: np.ndarray) -> np.ndarray:
    """Row squared norms as a left fold over dims (NOT np.sum — pairwise
    summation order differs from SQL's sequential list_sum)."""
    acc = np.zeros(len(X), dtype=np.float64)
    for i in range(X.shape[1]):
        acc = acc + X[:, i] * X[:, i]
    return acc


def _unit_rows_fold(X: np.ndarray) -> np.ndarray:
    return X / np.sqrt(np.maximum(_sq_norms_fold(X), 1e-24))[:, None]


def _subspace_d2_fold(U: np.ndarray, books: np.ndarray, j: int) -> np.ndarray:
    """(n, ks) squared L2 distances of every row's j-th subvector to every
    code of subspace j, folded left over the subspace dims."""
    dsub = books.shape[2]
    acc = np.zeros((len(U), books.shape[1]), dtype=np.float64)
    for i in range(dsub):
        diff = U[:, j * dsub + i, None] - books[j, None, :, i]
        acc = acc + diff * diff
    return acc


def _md5_head_rows(
    corpus: DataFrame, id_col: str, vec_col: str, limit: int, skip: int = 0
) -> np.ndarray:
    """Driver fetch of the ``limit`` corpus vectors at md5(id) ranks
    [skip, skip+limit) as a float64 (n, d) array — the shared selection
    step of every md5-fixed quantizer/codebook (orderBy+limit compiles to
    TakeOrderedAndProject: per-partition top-n, no shuffle). Callers
    normalize per their own float contract (np.linalg.norm for the
    argmax-decision paths, :func:`_unit_rows_fold` for value paths)."""
    rows = (
        corpus.select(
            F.md5(F.col(id_col).cast("string")).alias("h"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy("h")
        .limit(skip + limit)
        .toPandas()
        .iloc[skip:]
    )
    return np.asarray(rows["v"].tolist(), dtype=np.float64)


def _lut_udf(books: np.ndarray):
    """Shared per-query ADC lookup-table kernel: vector -> (m, ks) list of
    fold-ordered subspace distances (one definition so the pq_adc and
    ivfpq chains can never desynchronize)."""
    B = books
    m = B.shape[0]

    @pandas_udf("array<array<double>>")
    def _lut(vs: pd.Series) -> pd.Series:
        X = np.asarray(vs.tolist(), dtype=np.float64)
        U = _unit_rows_fold(X)
        out = []
        for r in range(len(U)):
            row = U[r : r + 1]
            out.append(
                [list(_subspace_d2_fold(row, B, j)[0]) for j in range(m)]
            )
        return pd.Series(out)

    return _lut


def fixed_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
) -> np.ndarray:
    """Deterministic, engine-portable PQ codebooks of shape (m, ks, d/m):
    subspace j's codes are the j-th subvector slices of the ``ks`` corpus
    vectors with the smallest ``md5(id)``, unit-normalized (full-vector
    norm) first; code index = rank in md5 order.

    Same verifiability device as :func:`fixed_centroids`: a pure function
    of the data, so DuckDB re-derives the exact codebooks, codes and ADC
    distances. Uniform-sample codebooks lose some quantization accuracy
    vs per-subspace k-means (:func:`train_pq_codebooks`) on heavily
    clustered corpora; their job is the value-checked chain.
    """
    X = _md5_head_rows(corpus, id_col, vec_col, ks)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible into {m} subspaces")
    U = _unit_rows_fold(X)
    dsub = d // m
    # (m, ks, dsub): books[j, c] = normalized row c's j-th slice
    return np.stack([U[:, j * dsub : (j + 1) * dsub] for j in range(m)])


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
    sample: int = 2000,
    iters: int = 10,
    seed: int = 42,
    corpus_count: int | None = None,
) -> np.ndarray:
    """Per-subspace Lloyd's k-means on a driver sample (the production
    quantizer — better codes on clustered corpora; unreproducible outside
    this process, so its guarantee is the recall assertion in pytest, not
    a SQL twin). Sampling protocol = :func:`train_centroids` (seeded
    Bernoulli + seeded-random limit, decorrelated from partition order).
    """
    v = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    total = corpus_count if corpus_count is not None else v.count()
    frac = min(1.0, (4.0 * sample) / max(total, 1))
    rows = (
        v.sample(withReplacement=False, fraction=frac, seed=seed)
        .orderBy(F.rand(seed))
        .limit(sample)
        .toPandas()
    )
    X = np.asarray(rows["v"].tolist(), dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible into {m} subspaces")
    U = _unit_rows_fold(X)
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        S = U[:, j * dsub : (j + 1) * dsub]
        k = min(ks, len(S))
        # k-means++ seeding per subspace
        idx = [int(rng.randint(len(S)))]
        d2 = np.sum((S - S[idx[0]]) ** 2, axis=1)
        for _ in range(1, k):
            tot = float(d2.sum())
            if tot <= 1e-12:
                break
            idx.append(int(rng.choice(len(S), p=d2 / tot)))
            d2 = np.minimum(d2, np.sum((S - S[idx[-1]]) ** 2, axis=1))
        C = S[idx].copy()
        for _ in range(iters):
            a = (
                ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
            )
            for ci in range(len(C)):
                mem = S[a == ci]
                if len(mem):
                    C[ci] = mem.mean(axis=0)
        if len(C) < ks:  # duplicate-heavy sample: pad with copies
            C = np.vstack([C, np.repeat(C[-1:], ks - len(C), axis=0)])
        books[j] = C
    return books


def pq_encode(
    corpus: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as its per-subspace nearest-code indices —
    ``(id, codes array<int>)``, the compressed corpus representation
    (write it partitioned/bucketed; the raw vectors never travel again).
    One Arrow-batched pass; argmin ties break to the LOWER code index
    (numpy argmin first-hit == the oracle's ORDER BY d2, cid)."""
    B = books
    m = B.shape[0]

    @pandas_udf("array<int>")
    def _enc(vs: pd.Series) -> pd.Series:
        X = np.asarray(vs.tolist(), dtype=np.float64)
        U = _unit_rows_fold(X)
        codes = np.empty((len(U), m), dtype=np.int32)
        for j in range(m):
            codes[:, j] = _subspace_d2_fold(U, B, j).argmin(axis=1)
        return pd.Series(list(codes))

    return corpus.select(
        F.col(id_col).alias("id"),
        _enc(F.col(vec_col).cast("array<double>")).alias("codes"),
    )


def _adc_dist(m: int):
    """The ADC fold as an UNROLLED sum of m element_at lookups —
    measured ~15% faster than aggregate(zip_with(...)) (no per-row
    intermediate array), and float-identical: the left-to-right add
    chain matches the aggregate fold exactly (the leading 0.0 + x of the
    fold is an exact IEEE no-op), so the SQL twins are unaffected."""
    dist = None
    for j in range(m):
        term = F.element_at(
            F.element_at("lut", j + 1), F.element_at("codes", j + 1) + F.lit(1)
        )
        dist = term if dist is None else dist + term
    return dist


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k by Asymmetric Distance Computation over the codes
    table: per query one (m x ks) LUT of subspace distances (Python — but
    only over the tiny broadcast query set), then the corpus scan is the
    UNROLLED sum of m ``element_at`` lookups (:func:`_adc_dist` — no
    per-row intermediate array, float-identical to the aggregate fold) —
    whole-stage-codegen JVM, m lookups + m adds per row, never touching a
    float vector. Returns (query_id, id, adc_d2, rank) ascending distance,
    rank ties broken on id.
    """
    m = books.shape[0]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        # asNondeterministic: engine-wide guard against Catalyst's
        # inferred isnotnull filter re-evaluating the Python LUT UDF
        # (values are deterministic; this only pins single evaluation).
        _lut_udf(books).asNondeterministic()(
            F.col(vec_col).cast("array<double>")
        ).alias("lut"),
    )
    joined = codes_df.crossJoin(F.broadcast(q))
    if not include_self:
        joined = joined.where(F.col("id") != F.col("query_id"))
    scored = joined.select("query_id", "id", _adc_dist(m).alias("adc_d2"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivfpq_topk(
    corpus_cells_codes: DataFrame,
    queries: DataFrame,
    cents: np.ndarray,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    include_self: bool = False,
) -> DataFrame:
    """IVF-PQ: the standard billion-to-trillion-scale ANN layout (coarse
    inverted cells prune WHICH rows are scanned, PQ codes compress WHAT is
    scanned) — the composition of :func:`ivf_topk`'s probe pruning and
    :func:`pq_adc_topk`'s ADC scan. ``corpus_cells_codes`` carries
    ``(id, cell, codes)`` from :func:`assign_cells` + :func:`pq_encode`
    (at scale: written cell-partitioned, so probing is partition pruning).
    Per query: ``nprobe`` nearest cells + one (m x ks) LUT; the scan is a
    broadcast equi-join on ``cell`` followed by the JVM-only ADC fold —
    cells are disjoint so no pair dedup is needed. Codes quantize the raw
    unit vectors, NOT per-cell residuals (classic IVFADC refines residuals
    for accuracy; raw-vector codes keep one global codebook relation and
    the engine-portable value oracle — the documented trade).

    Returns (query_id, id, adc_d2, rank), ascending distance, ties on id.
    """
    C = cents
    m = books.shape[0]
    n_cells = len(C)
    nprobe = min(nprobe, n_cells)

    @pandas_udf("array<int>")
    def _probes(vs: pd.Series) -> pd.Series:
        # fold-ordered norms + dots (not linalg.norm/matmul): the probe
        # DECISIONS then come from the same doubles the SQL twin ranks,
        # removing the near-tie flakiness window the matmul path leaves
        # open (review finding; the ivf_fixed chain keeps the matmul
        # device its committed golden output was generated with)
        X = np.asarray(vs.tolist(), dtype=np.float64)
        U = _unit_rows_fold(X)
        order = np.argsort(-_dot_fold(U, C), axis=1, kind="stable")[
            :, :nprobe
        ].astype(np.int32)
        return pd.Series(list(order))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).select(
        "query_id",
        # asNondeterministic: stop Catalyst's infer-filters-from-generate
        # re-evaluating the kernels under the explode (engine-wide device,
        # see operators/blocking.minhash_bands_udf)
        F.explode(_probes.asNondeterministic()("qv")).alias("cell"),
        _lut_udf(books).asNondeterministic()("qv").alias("lut"),
    )
    joined = corpus_cells_codes.join(F.broadcast(q), "cell")
    if not include_self:
        joined = joined.where(F.col("id") != F.col("query_id"))
    scored = joined.select("query_id", "id", _adc_dist(m).alias("adc_d2"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def fixed_centroids_fold(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> np.ndarray:
    """:func:`fixed_centroids` with the normalization computed as the
    sequential left fold (:func:`_unit_rows_fold`) instead of
    ``np.linalg.norm``. For cell ASSIGNMENT the two are interchangeable
    (argmax decisions absorb 1-ulp differences); for RESIDUAL encoding
    (:func:`ivfpq_residual_topk`) the centroid VALUES enter the quantized
    arithmetic, so they must match the oracle's fold-normalized vectors
    bit-for-bit."""
    return _unit_rows_fold(
        _md5_head_rows(corpus, id_col, vec_col, n_cells)
    )


def fixed_residual_pq_codebooks(
    corpus: DataFrame,
    cents: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
    skip: int | None = None,
) -> np.ndarray:
    """Residual PQ codebooks (classic IVFADC, Jegou PAMI 2011 §III):
    codes quantize ``u − centroid[cell(u)]`` rather than ``u`` itself —
    residual magnitudes are far smaller than vector magnitudes, so the
    same code budget buys a much finer quantization. Codebook entries are
    the RESIDUALS of the ``ks`` smallest-md5 corpus rows w.r.t. their own
    nearest cell (one codebook shared across cells — the standard
    memory/accuracy trade), sliced per subspace. Pure function of the
    data; pass ``cents`` from :func:`fixed_centroids_fold` so every value
    entering the arithmetic is fold-normalized on both engines.

    ``skip`` (default ``len(cents)``): the codebook takes md5 ranks
    ``[skip, skip+ks)``, NOT ``[0, ks)`` — the first ``len(cents)`` md5
    rows ARE the centroids, so their residuals are exact zero vectors and
    a codebook drawn from rank 0 would waste up to ``len(cents)`` of its
    ``ks`` codes on duplicates of the origin (a measured degeneracy, see
    test_residual_quantization_beats_raw).
    """
    if skip is None:
        skip = len(cents)
    X = _md5_head_rows(corpus, id_col, vec_col, ks, skip=skip)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible into {m} subspaces")
    U = _unit_rows_fold(X)
    # nearest cell by the same fold-order dot product the oracle uses
    cells = _dot_fold(U, cents).argmax(axis=1)
    R = U - cents[cells]
    dsub = d // m
    return np.stack([R[:, j * dsub : (j + 1) * dsub] for j in range(m)])


def _dot_fold(U: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) dot products folded left over dims (matmul uses blocked
    accumulation — different rounding than SQL's sequential list_sum)."""
    acc = np.zeros((len(U), len(C)), dtype=np.float64)
    for i in range(U.shape[1]):
        acc = acc + U[:, i, None] * C[None, :, i]
    return acc


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cents: np.ndarray,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    include_self: bool = False,
) -> DataFrame:
    """True IVFADC: probed cells + RESIDUAL-quantized codes. The corpus
    pass assigns each vector its nearest cell and encodes the residual
    ``u − cent[cell]`` (one Arrow kernel emitting (id, cell, codes)); the
    query side builds one LUT **per probed cell** — the residual
    ``u_q − cent[cell]`` changes per cell, which is exactly why IVFADC
    beats raw-vector PQ: both sides quantize in the same cell-local
    frame. The scan is the identical JVM-only unrolled fold over a
    broadcast (cell → lut) join. All arithmetic is fold-ordered, so the
    chain keeps the bit-exact SQL twin (SQL_IVFPQ_RESIDUAL_TOPK).

    Returns (query_id, id, adc_d2, rank).
    """
    C = cents
    B = books
    m = B.shape[0]
    n_cells = len(C)
    nprobe = min(nprobe, n_cells)

    @pandas_udf("struct<cell:int, codes:array<int>>")
    def _enc(vs: pd.Series) -> pd.DataFrame:
        X = np.asarray(vs.tolist(), dtype=np.float64)
        U = _unit_rows_fold(X)
        cell = _dot_fold(U, C).argmax(axis=1)
        R = U - C[cell]
        codes = np.empty((len(U), m), dtype=np.int32)
        for j in range(m):
            codes[:, j] = _subspace_d2_fold(R, B, j).argmin(axis=1)
        return pd.DataFrame(
            {"cell": cell.astype(np.int32), "codes": list(codes)}
        )

    @pandas_udf("array<struct<cell:int, lut:array<array<double>>>>")
    def _probe_luts(vs: pd.Series) -> pd.Series:
        X = np.asarray(vs.tolist(), dtype=np.float64)
        U = _unit_rows_fold(X)
        # stable argsort: probe-order ties -> lower cell id (oracle's
        # ORDER BY cos DESC, ccid ASC)
        order = np.argsort(-_dot_fold(U, C), axis=1, kind="stable")[
            :, :nprobe
        ]
        out = []
        for r in range(len(U)):
            entry = []
            for cell in order[r]:
                res = (U[r] - C[cell])[None, :]
                entry.append(
                    {
                        "cell": int(cell),
                        "lut": [
                            list(_subspace_d2_fold(res, B, j)[0])
                            for j in range(m)
                        ],
                    }
                )
            out.append(entry)
        return pd.Series(out)

    c = corpus.select(
        F.col(id_col).alias("id"),
        _enc.asNondeterministic()(
            F.col(vec_col).cast("array<double>")
        ).alias("_e"),
    ).select("id", F.col("_e.cell").alias("cell"), F.col("_e.codes").alias("codes"))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(
                _probe_luts.asNondeterministic()(
                    F.col(vec_col).cast("array<double>")
                )
            ).alias("_p"),
        )
        .select(
            "query_id",
            F.col("_p.cell").alias("cell"),
            F.col("_p.lut").alias("lut"),
        )
    )
    joined = c.join(F.broadcast(q), "cell")
    if not include_self:
        joined = joined.where(F.col("id") != F.col("query_id"))
    scored = joined.select("query_id", "id", _adc_dist(m).alias("adc_d2"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
