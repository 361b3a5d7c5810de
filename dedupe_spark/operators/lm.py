"""Character-trigram language-model quality scoring (CCNet-style,
Wenzek et al. 2020): train n-gram counts on a reference slice of the
corpus, then score every document by its average negative log-likelihood
(nats/trigram) under the add-one-smoothed model — the "does this look
like the reference distribution" filter a web-text training pipeline
applies after the rule-based Gopher signals. CCNet uses a KenLM 5-gram
over SentencePiece tokens; the distributional idea is identical, the
char-trigram form keeps the model closed over the corpus (no external
data) and exactly re-derivable in SQL.

Reference parity note: the reference app (backend/dedupe_script.py) has
no LM scorer — this is part of the beyond-reference training-data
toolkit (SURVEY.md §6), same family as text.quality_features and
operators/decontam.py.

Scale design (the 100 TB story):
- The MODEL is tiny and bounded: at most |charset|³ distinct trigrams
  (≲ a few hundred thousand for real web text after lowercasing), so
  both count relations are broadcast to the scoring join — the corpus
  side never shuffles on a gram key.
- Corpus-side shuffles key by ``(doc_id, trigram)`` then ``doc_id``
  only (partial aggregation makes the wire volume per-doc DISTINCT
  trigrams, not positions) — the same shape as text.repetition_scores.
- Training-side count aggregation shuffles the slice once on the
  trigram key with map-side combine; output rows = |model|.
- Engine-portable floats: each trigram's log-probability is quantized
  to an integer number of micro-nats (``round(ln(p)·1e6)`` as BIGINT)
  BEFORE the per-document sum, so the aggregation is exact integer
  arithmetic — associative, partition-order-independent, and identical
  in Spark and DuckDB. Only the final per-doc division is float, on
  identical integer inputs. (A raw double sum would be legal Spark but
  its value depends on partition order — unhashable across engines.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "norm_text_expr",
    "train_char_trigram_lm",
    "score_char_trigram_nll",
    "NORM_SQL",
    "SMOOTH_ADD",
    "SMOOTH_VOCAB",
]

# add-alpha smoothing: p(c|ab) = (C3(abc) + SMOOTH_ADD) / (C2(ab) + SMOOTH_VOCAB)
# SMOOTH_VOCAB plays alpha*|V|; 128 ~ a lowercased web-text charset.
SMOOTH_ADD = 1.0
SMOOTH_VOCAB = 128.0

# lowercase + collapse whitespace runs to one space: the only text
# normalization before character n-grams. The explicit [ \t\n\r] class
# (not \s) keeps Java-regex and RE2/DuckDB semantics identical.
NORM_SQL = "trim(regexp_replace(lower({col}), '[ \\t\\n\\r]+', ' ', 'g'))"


def norm_text_expr(col: str) -> Column:
    """Spark twin of :data:`NORM_SQL` (Spark's regexp_replace is global
    by default; DuckDB needs the explicit 'g' flag)."""
    return F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(col), F.lit(""))), "[ \t\n\r]+", " ")
    )


def _trigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tri) — one row per character-trigram OCCURRENCE. Documents
    whose normalized text is shorter than 3 chars emit nothing (explode
    drops them; callers re-attach with a left join). The position
    explode is transient: it feeds straight into a partially-aggregated
    count, so the shuffle never carries per-position rows."""
    s = docs.select(F.col(id_col).alias("_id"), norm_text_expr(text_col).alias("s"))
    return (
        s.where(F.length("s") >= 3)
        .select(
            "_id",
            "s",
            F.explode(F.sequence(F.lit(1), F.length("s") - 2)).alias("i"),
        )
        .select("_id", F.col("s").substr(F.col("i"), F.lit(3)).alias("tri"))
    )


def train_char_trigram_lm(
    train_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(lm3, lm2): trigram occurrence counts ``(tri, c3)`` over the
    training slice, and their 2-char-context counts ``(bi, c2)`` derived
    as ``sum(c3)`` per prefix — so C2 counts exactly the contexts that
    START a trigram and the model is self-consistent at text edges
    (no begin/end padding tokens)."""
    lm3 = (
        _trigrams(train_docs, id_col, text_col)
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    lm2 = (
        lm3.select(F.substring("tri", 1, 2).alias("bi"), "c3")
        .groupBy("bi")
        .agg(F.sum("c3").alias("c2"))
    )
    return lm3, lm2


def score_char_trigram_nll(
    docs: DataFrame,
    lm3: DataFrame,
    lm2: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document LM fit: ``(id_col, n_tri, oov_frac, avg_nll)``.

    - ``n_tri``: trigram occurrences scored (0 for <3-char docs, whose
      ratio columns are NULL — they carry no distributional evidence).
    - ``oov_frac``: fraction of occurrences whose trigram never appears
      in training (the hard-OOV signal, exact rational).
    - ``avg_nll``: mean negative log-likelihood in nats/trigram under
      add-one smoothing, low = reference-like, high = gibberish/
      off-distribution — threshold it like CCNet's perplexity buckets.
      Micro-nat integer quantization before the sum (module docstring)
      makes the value bit-reproducible across engines and partitionings.

    Both model relations are broadcast: the per-doc trigram counts never
    shuffle to meet the model.
    """
    tc = (
        _trigrams(docs, id_col, text_col)
        .groupBy("_id", "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sc = (
        tc.join(F.broadcast(lm3), "tri", "left")
        .join(
            F.broadcast(lm2),
            F.substring(tc["tri"], 1, 2) == lm2["bi"],
            "left",
        )
        .select(
            "_id",
            "cnt",
            F.coalesce("c3", F.lit(0)).alias("c3"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
    )
    # integer micro-nats: round(ln((c3+1)/(c2+128)) * 1e6) as BIGINT
    lp = F.round(
        F.log(
            (F.col("c3") + F.lit(SMOOTH_ADD)) / (F.col("c2") + F.lit(SMOOTH_VOCAB))
        )
        * F.lit(1000000.0),
        0,
    ).cast("long")
    agg = sc.groupBy("_id").agg(
        F.sum("cnt").alias("n_tri"),
        F.sum(F.col("cnt") * lp).alias("sum_lp"),
        F.sum(F.when(F.col("c3") == 0, F.col("cnt")).otherwise(F.lit(0))).alias(
            "n_oov"
        ),
    )
    base = docs.select(F.col(id_col).alias("_id"))
    return (
        base.join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.round(F.col("n_oov").cast("double") / F.col("n_tri"), 6).alias(
                "oov_frac"
            ),
            F.round(
                (-F.col("sum_lp")) / (F.lit(1000000.0) * F.col("n_tri")), 6
            ).alias("avg_nll"),
        )
    )
