"""BM25 keyword search over the corpus — inverted-index-shaped plan.

Full-text relevance ranking (Robertson/Sparck Jones BM25 with the
Lucene-style +1 idf floor) expressed so the only relations that ever
shuffle are term-filtered:

- the postings build filters tokens to the query terms BEFORE its
  groupBy, so the tf shuffle carries only matching tokens (a handful of
  rows per matching doc), never the corpus;
- document-frequency and the corpus stats (N, avgdl) are tiny relations
  joined back by broadcast;
- the final top-k is orderBy+limit = TakeOrderedAndProject (per-partition
  heap + driver merge of k·partitions rows) — no global sort.

Determinism contract (engine-portable value oracle): the per-(doc, term)
BM25 contribution is one deterministic double expression; it is quantized
to integer micro-units BEFORE the per-doc sum (sum order across terms is
partition-dependent; int64 addition is not) — the operators/lm.py
micro-nat trick. Ties broken by doc id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs for a bag-of-terms query: (id, score, rnk)."""
    if not terms:
        raise ValueError("bm25_topk: terms must be non-empty")
    did, txt = F.col(id_col), F.col(text_col)
    dl = docs.select(
        did.alias("doc_id"),
        F.when(
            txt.isNull() | (F.trim(txt) == ""), F.lit(0)
        ).otherwise(F.size(F.split(F.trim(txt), r"\s+"))).cast("long").alias("dl"),
    )
    # exact int64 sum + count instead of avg(): engines may accumulate
    # avg() as incremental doubles (order-dependent); sum/count is exact
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    toks = docs.where(txt.isNotNull() & (F.trim(txt) != "")).select(
        did.alias("doc_id"),
        F.explode(F.split(F.trim(txt), r"\s+")).alias("term"),
    )
    tf = (
        toks.where(F.col("term").isin(*terms))  # filter BEFORE the shuffle
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    j = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    denom = F.col("tf") + K1 * (
        F.lit(1 - B) + F.lit(B) * F.col("dl") / avgdl
    )
    s = idf * (F.col("tf") * F.lit(K1 + 1)) / denom
    micro = F.round(s * F.lit(1000000.0), 0).cast("long")
    scored = (
        j.select("doc_id", micro.alias("micro"))
        .groupBy("doc_id")
        .agg((F.sum("micro") / 1000000.0).alias("score"))
    )
    ranked = scored.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(k)
    # rank the k survivors (window over k rows, not the corpus)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return ranked.select(
        "doc_id",
        F.round("score", 6).alias("score"),
        F.row_number().over(w).alias("rnk"),
    )


def bm25_topk_sql(terms: Sequence[str], k: int = 10) -> str:
    """DuckDB twin: same expressions, same association order, same
    micro-unit quantization — bit-identical scores."""
    if not terms:
        raise ValueError("bm25_topk_sql: terms must be non-empty")
    # escape quotes: a term like "o'brien" must not break (or inject
    # into) the generated SQL
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return rf"""
WITH dll AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS dl
  FROM documents
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dll
), tk AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tk
  WHERE term IN ({tlist}) GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id,
         CAST(round(
           ln((CAST(stats.n_docs - dfreq.df AS DOUBLE) + 0.5)
              / (dfreq.df + 0.5) + 1.0)
           * (tf.tf * {K1 + 1!r})
           / (tf.tf + {K1!r} * ({1 - B!r} + {B!r} * dll.dl
                                / (CAST(stats.sum_dl AS DOUBLE) / stats.n_docs)))
           * 1000000.0, 0) AS BIGINT) AS micro
  FROM tf
  JOIN dfreq USING (term)
  JOIN dll USING (doc_id)
  CROSS JOIN stats
), agg AS (
  SELECT doc_id, sum(micro) / 1000000.0 AS score FROM scored GROUP BY 1
)
SELECT doc_id, round(score, 6) AS score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rnk
FROM agg ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def phrase_match(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact multi-token phrase search via a positional-postings join →
    ``(doc_id, n_hits, first_pos)`` for documents containing the phrase
    as a consecutive whitespace-token run (the positional-index query
    BM25's bag-of-terms ranking cannot answer).

    Plan (one token explode, token-filtered BEFORE any shuffle, exactly
    like the BM25 postings build): each occurrence of phrase term i at
    position p votes for anchor ``p − i`` — a document contains the
    phrase at anchor a iff all len(phrase) DISTINCT offsets voted for
    (doc, a). Repeated phrase terms are why the count is distinct-i,
    not rows: in "table table" one token occurrence votes for TWO
    anchors, and an anchor needs offsets {0,1}, not two votes. The
    per-(doc, anchor) aggregate is map-side combinable; the offsets
    relation (len(phrase) rows) broadcasts. No window, no self-join of
    the corpus, no per-row Python.
    """
    terms = phrase.split()
    if not terms:
        raise ValueError("phrase_match: phrase must be non-empty")
    did, txt = F.col(id_col), F.col(text_col)
    spark = docs.sparkSession
    offs = spark.createDataFrame(
        list(enumerate(terms)), "i int, term string"
    )
    toks = (
        docs.where(txt.isNotNull() & (F.trim(txt) != ""))
        .select(
            did.alias("doc_id"),
            F.posexplode(F.split(F.trim(txt), r"\s+")).alias("pos", "term"),
        )
        .where(F.col("term").isin(*terms))  # filter BEFORE the shuffle
    )
    hits = toks.join(F.broadcast(offs), "term").select(
        "doc_id",
        (F.col("pos") - F.col("i")).cast("long").alias("anchor"),
        "i",
    )
    anchors = (
        hits.groupBy("doc_id", "anchor")
        .agg(F.count_distinct("i").alias("c"))
        .where(F.col("c") == len(terms))
    )
    return (
        anchors.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.min("anchor").alias("first_pos"),
        )
        .orderBy("doc_id")
    )


def phrase_match_sql(phrase: str) -> str:
    """DuckDB twin of :func:`phrase_match`: the positional postings are
    re-derived with a list_transform position/token struct unnest (no
    zip-alignment assumptions), then the same anchor-vote HAVING."""
    terms = phrase.split()
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(terms))
    return f"""
WITH toks AS (
  SELECT doc_id, u.t AS term, u.p AS pos FROM (
    SELECT doc_id,
           unnest(list_transform(range(0, len(tk)),
                                 i -> struct_pack(p := i, t := tk[i + 1]))) AS u
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
          FROM documents
          WHERE text IS NOT NULL AND trim(text) <> '')
  )
), offs(i, term) AS (VALUES {vals}),
hits AS (
  SELECT doc_id, CAST(pos - i AS BIGINT) AS anchor, i
  FROM toks JOIN offs USING (term)
),
anchors AS (
  SELECT doc_id, anchor FROM hits
  GROUP BY doc_id, anchor HAVING count(DISTINCT i) = {len(terms)}
)
SELECT doc_id, count(*) AS n_hits, CAST(min(anchor) AS BIGINT) AS first_pos
FROM anchors GROUP BY doc_id ORDER BY doc_id
"""
