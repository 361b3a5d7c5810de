"""Exact set-similarity self-join via prefix filtering (AllPairs/PPJoin).

The one near-dup operator in the engine with a COMPLETENESS guarantee:
every pair whose word-set Jaccard >= threshold is returned — no blocking
recall loss (``ngram_jaccard_pairs`` only sees pairs sharing a block
key; MinHash/SimHash are probabilistic). The classic exact-ssjoin
literature: prefix filtering (Chaudhuri/Ganti/Kaushik ICDE'06), All-Pairs
(Bayardo/Ma/Srikant WWW'07), the MapReduce formulation this plan follows
(Vernica/Carey/Li SIGMOD'10).

Why it scales where the naive token join does not: J(A,B) >= t implies
|A∩B| >= ceil(t*|A|), so A's prefix — its |A| - ceil(t*|A|) + 1 tokens
that come FIRST in a global rarest-first order — must intersect B's
prefix (the smallest common token in that order sits inside both). Only
prefixes are joined, and because the order is ascending document
frequency, the join keys are each document's RAREST tokens: stopword-
grade keys (the skew killers of the naive plan) are structurally pushed
out of the prefix by every document that has rarer words to offer. A
length filter (min(s1,s2) >= t*max(s1,s2), necessary since J <=
min/max) prunes candidates before the verify shuffle.

Verification is exact and all-JVM: candidates join each side's sorted
distinct-token array once, overlap = size(array_intersect), jaccard =
ov/(s1+s2-ov) — one IEEE division, identical in DuckDB, so the operator
carries a full value oracle and the oracle (a brute-force token join)
doubles as the exactness proof: prefix filtering must drop NOTHING.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fp guard on ceil(t*sz): under-ceiling only lengthens the prefix (safe);
# over-ceiling from float noise would shorten it and break completeness
_EPS = 1e-9


def _tokens(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct (id, token) where token is an n-word shingle (n=1: the
    plain word set). Docs with fewer than n words produce no rows and
    are excluded from the join entirely — identical on the DuckDB side."""
    txt = F.col(text_col)
    arr = F.split(F.trim(txt), r"\s+")
    if n == 1:
        tok = F.explode(arr)
    else:
        sh = F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(arr) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(arr, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        tok = F.explode(sh)
    return (
        docs.where(txt.isNotNull() & (F.trim(txt) != ""))
        .select(F.col(id_col).alias("id"), tok.alias("token"))
        .distinct()
    )


def set_similarity_join(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """All (id1, id2, jaccard) with n-word-shingle-set Jaccard >=
    threshold, exact.

    id1 < id2. The threshold is applied to the TRUE (unrounded) Jaccard
    — the same quantity the prefix and length filters bound, so the
    completeness guarantee is exact (a rounded-value filter would admit
    pairs the pruning bounds legitimately dropped). The output column is
    rounded to 6 dp for display/hashing; the DuckDB twin filters on the
    identical unrounded IEEE division.
    """
    toks = _tokens(docs, id_col, text_col, n)
    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
    freq = toks.groupBy("token").agg(F.count("*").alias("df"))
    pos = Window.partitionBy("id").orderBy("df", "token")
    plen = F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - _EPS) + 1
    prefix = (
        toks.join(freq, "token")
        .join(sizes, "id")
        .withColumn("pos", F.row_number().over(pos))
        .where(F.col("pos") <= plen)
        .select("token", "id", "sz")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(b, "token")
        .where(F.col("a.id") < F.col("b.id"))
        # length filter: J <= min/max, so min(s1,s2) must reach t*max
        .where(
            F.least("a.sz", "b.sz") + F.lit(_EPS)
            >= F.lit(threshold) * F.greatest("a.sz", "b.sz")
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    arrs = toks.groupBy("id").agg(
        F.sort_array(F.collect_set("token")).alias("toks"),
        F.count("*").alias("sz"),
    )
    a1 = arrs.select(
        F.col("id").alias("id1"),
        F.col("toks").alias("t1"),
        F.col("sz").alias("s1"),
    )
    a2 = arrs.select(
        F.col("id").alias("id2"),
        F.col("toks").alias("t2"),
        F.col("sz").alias("s2"),
    )
    ov = F.size(F.array_intersect("t1", "t2")).cast("long")
    jac = ov.cast("double") / (F.col("s1") + F.col("s2") - ov).cast("double")
    return (
        cand.join(a1, "id1")
        .join(a2, "id2")
        .select("id1", "id2", jac.alias("_jt"))
        .where(F.col("_jt") >= F.lit(threshold))
        .select("id1", "id2", F.round("_jt", 6).alias("jaccard"))
    )


def edit_distance_join(
    docs: DataFrame,
    tau: int,
    id_col: str = "doc_id",
    str_col: str = "s",
    q: int = 4,
) -> DataFrame:
    """All (id1, id2, dist) with ``levenshtein(s1, s2) <= tau``, exact —
    the edit-distance member of the similarity-join family (set-Jaccard:
    :func:`set_similarity_join`; the sketches: dedup.py). Ed-Join-style
    q-gram prefix filtering (Gravano et al. VLDB'01; Xiao/Wang/Lin
    VLDB'08), verified with Spark's built-in banded ``levenshtein(l, r,
    threshold)`` — the whole pipeline is JVM built-ins, no Python.
    Brand-new expression for this engine; the reference's affine-gap
    scorer compares *given* candidate pairs, it never FINDS all pairs
    within an edit bound.

    Completeness proof carried by the plan (the DuckDB twin is the
    brute-force join, so the gate re-proves it on real data):

    - one edit touches at most q char q-grams, so ed(s1,s2) <= tau
      implies |set(G1) ∖ set(G2)| <= q·tau, hence the DISTINCT-gram
      overlap is >= max(|G1|,|G2|) − q·tau;
    - if the larger side has more than q·tau distinct grams that bound
      is >= 1, and by the standard prefix-filter theorem the pair must
      share a gram among each side's first q·tau + 1 grams in ANY global
      total order — we order by (document frequency asc, gram), so the
      join keys are each string's RAREST grams (the skew-killing choice:
      boilerplate grams are pushed out of every prefix that has rarer
      material to offer);
    - strings whose distinct-gram count is <= q·tau (shorter than
      ~q(tau+1) chars, or degenerate single-char runs) get no guarantee
      from the prefix — they form the SHORT BUCKET, joined all-pairs
      among themselves under the length filter. A short×long survivor
      is impossible outside the prefix join: if the short side has no
      grams at all (len < q), tau-closeness forces the partner under
      q + tau chars, i.e. into the bucket too; otherwise the short
      side's prefix IS its whole gram set and the long side's
      max-bound applies. The bucket is broadcast-sized by construction
      (only near-q-length or single-gram-run strings land in it).
    - |len1 − len2| <= tau prunes both candidate streams (each edit
      changes length by at most 1).

    Verification joins the strings back and keeps ``levenshtein(s1, s2,
    tau) >= 0`` — the 3-arg form runs the banded O(tau·n) DP and returns
    −1 above the bound, so verify cost per candidate is linear, not
    quadratic, in string length. id1 < id2."""
    base = docs.where(F.col(str_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("s"),
        F.length(str_col).alias("l"),
    )
    grams = base.where(F.col("l") >= q).select(
        "id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.col("l") - q + 1),
                    lambda i: F.col("s").substr(i, F.lit(q)),
                )
            )
        ).alias("gram"),
    )
    gcnt = grams.groupBy("id").agg(F.count("*").alias("gc"))
    freq = grams.groupBy("gram").agg(F.count("*").alias("df"))
    pre_w = Window.partitionBy("id").orderBy("df", "gram")
    lens = base.select("id", "l")
    prefix = (
        grams.join(freq, "gram")
        .withColumn("pos", F.row_number().over(pre_w))
        .where(F.col("pos") <= q * tau + 1)
        .select("gram", "id")
        .join(lens, "id")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand_long = (
        a.join(b, "gram")
        .where(
            (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.l") - F.col("b.l")) <= tau)
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
    )
    shorts = (
        base.join(gcnt, "id", "left")
        .where(F.coalesce(F.col("gc"), F.lit(0)) <= q * tau)
        .select("id", "l")
    )
    sa, sb = shorts.alias("sa"), shorts.alias("sb")
    cand_short = (
        sa.join(
            F.broadcast(sb),
            (F.col("sa.id") < F.col("sb.id"))
            & (F.abs(F.col("sa.l") - F.col("sb.l")) <= tau),
        )
        .select(F.col("sa.id").alias("id1"), F.col("sb.id").alias("id2"))
    )
    cand = cand_long.unionByName(cand_short).distinct()
    s1 = base.select(F.col("id").alias("id1"), F.col("s").alias("s1"))
    s2 = base.select(F.col("id").alias("id2"), F.col("s").alias("s2"))
    return (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("dist", F.levenshtein("s1", "s2", tau))
        .where(F.col("dist") >= 0)
        .select("id1", "id2", "dist")
    )


def edit_distance_join_sql(rel_sql: str, tau: int) -> str:
    """DuckDB twin: brute-force length-banded join — equality with the
    Spark result proves the prefix filter and short-bucket routing drop
    NOTHING (completeness), and the kept distances match value-for-value
    (both engines' levenshtein is the plain character-level DP).
    ``rel_sql`` must yield columns (id, s)."""
    return f"""
WITH rel AS ({rel_sql})
SELECT a.id AS id1, b.id AS id2, levenshtein(a.s, b.s) AS dist
FROM rel a JOIN rel b
  ON a.id < b.id AND abs(length(a.s) - length(b.s)) <= {tau}
WHERE levenshtein(a.s, b.s) <= {tau}
"""


def set_similarity_join_sql(
    table: str,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> str:
    """DuckDB twin: brute-force token join (no prefix filter) — equality
    with the Spark result proves the filter's completeness, not just its
    precision."""
    if n == 1:
        tok = f"unnest(regexp_split_to_array(trim({text_col}), '\\s+'))"
        src = f"""
  SELECT DISTINCT {id_col} AS id, {tok} AS token
  FROM {table}
  WHERE {text_col} IS NOT NULL AND trim({text_col}) <> ''"""
    else:
        src = f"""
  SELECT DISTINCT id, unnest(
    list_transform(range(1, greatest(len(a) - {n - 1}, 0) + 1),
                   i -> array_to_string(list_slice(a, i, i + {n - 1}), ' '))
  ) AS token
  FROM (
    SELECT {id_col} AS id,
           regexp_split_to_array(trim({text_col}), '\\s+') AS a
    FROM {table}
    WHERE {text_col} IS NOT NULL AND trim({text_col}) <> ''
  )"""
    return f"""
WITH toks AS ({src}
), sizes AS (
  SELECT id, count(*) AS sz FROM toks GROUP BY id
), ov AS (
  SELECT a.id AS id1, b.id AS id2, count(*) AS ov
  FROM toks a JOIN toks b ON a.token = b.token AND a.id < b.id
  GROUP BY 1, 2
), scored AS (
  SELECT id1, id2,
         CAST(ov AS DOUBLE) / CAST(s1.sz + s2.sz - ov AS DOUBLE) AS jt
  FROM ov
  JOIN sizes s1 ON ov.id1 = s1.id
  JOIN sizes s2 ON ov.id2 = s2.id
)
SELECT id1, id2, round(jt, 6) AS jaccard FROM scored
WHERE jt >= {threshold!r}
"""
