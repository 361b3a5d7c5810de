"""Distributed byte-pair-encoding tokenizer training (Sennrich et al.
2016): learn the first ``n_merges`` BPE merge rules from a document
corpus by iteratively (1) counting adjacent symbol pairs weighted by
word frequency, (2) merging the most frequent pair everywhere, with a
total deterministic tie order (count DESC, left ASC, right ASC).

Reference parity note: the reference app (backend/dedupe_script.py) has
no tokenizer trainer — this extends the beyond-reference training-data
toolkit (SURVEY.md §6): a corpus-scale vocabulary is the one tokenizer
input that genuinely needs the cluster, and this is the canonical
algorithm for it.

Scale design (the 100 TB story):
- **The corpus is touched exactly once**: one whitespace pre-tokenize →
  ``groupBy(word).count()`` shuffle (map-side combinable). Every merge
  round after that operates on the DISTINCT-WORD relation — bounded by
  vocabulary size (~10^8 at web scale), not corpus size (~10^12 docs).
  This is why BPE training distributes: the classic single-node
  implementation holds the word-frequency dict in memory; here it is a
  DataFrame and each round is one bounded groupBy.
- Each round: explode adjacent symbol pairs (weighted by word count),
  aggregate, take the argmax (count DESC, pair ASC — a 1-row
  TakeOrderedAndProject, not a global sort), and apply the merge with a
  built-in ``aggregate`` (fold) expression — a left-to-right scan in
  whole-stage codegen, no Python workers anywhere.
- The per-round driver collect is ONE scalar row (the chosen pair) —
  the k-means-centroid idiom (operators/ann.py), not a data loop; the
  word relation is localCheckpoint()-ed per round to truncate lineage
  (the connected-components idiom, operators/clustering.py).
- Engine-portable: symbols are delimiter-joined with US (chr(31),
  filtered from input words), counts are exact BIGINTs, and the merge
  fold is reproduced verbatim by DuckDB's ``list_reduce`` — the SQL twin
  unrolls the same fixed rounds (the pagerank unrolled-CTE idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lifecycle import track

__all__ = ["train_bpe", "encode_tokens", "N_MERGES", "MAX_WORD_LEN", "US"]

N_MERGES = 6
# GPT-2-style pre-tokenization caps pathological "words"; a 10k-char blob
# would otherwise explode to 10k symbols in the vocab relation.
MAX_WORD_LEN = 64
US = "\x1f"  # symbol delimiter; words containing it are filtered out


def _words(docs: DataFrame, text_col: str, max_word_len: int) -> DataFrame:
    """(syms STRING, cnt BIGINT) — the word-frequency relation, each word
    pre-split into US-joined character symbols. The ONLY corpus-scale
    pass; output is vocabulary-bounded."""
    w = (
        docs.select(
            F.explode(
                F.split(
                    F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                    "[ \t\n\r]+",
                )
            ).alias("word")
        )
        .where(
            (F.col("word") != "")
            & (F.length("word") <= max_word_len)
            & (~F.col("word").contains(US))
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return w.select(
        F.array_join(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
            US,
        ).alias("syms"),
        "cnt",
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, pc) — adjacent-symbol pair counts weighted by word count."""
    return (
        words.select(
            "cnt", F.split(F.col("syms"), US, -1).alias("sy")
        )
        .where(F.size("sy") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(slice(sy, 1, size(sy) - 1),"
                    " (t, i) -> struct(t AS a, sy[i + 1] AS b))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("pc"))
    )


def _apply_merge(words: DataFrame, a: str, b: str) -> DataFrame:
    """Left-to-right merge of adjacent pair (a, b) in every word — a
    built-in fold over the symbol list (lit-closure lambdas: symbol
    strings never touch SQL-literal interpolation on the Spark side)."""
    la = len(a)
    merged = F.aggregate(
        F.split(F.col("syms"), US, -1),
        F.lit(""),
        lambda acc, x: F.when(acc == F.lit(""), x)
        .when(
            ((acc == F.lit(a)) | acc.endswith(F.lit(US + a))) & (x == F.lit(b)),
            F.concat(
                F.substring(acc, 1, F.length(acc) - F.lit(la)), F.lit(a + b)
            ),
        )
        .otherwise(F.concat(acc, F.lit(US), x)),
    )
    return words.select(merged.alias("syms"), "cnt")


def encode_tokens(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """APPLY a trained merge list: the corpus token histogram
    ``(token STRING, tok_count BIGINT)`` under the given rules, applied
    in rank order with the same left-to-right fold as training.

    The scale shape mirrors the trainer: one corpus pass builds the
    word-frequency relation, then every merge is a codegen'd fold over
    the DISTINCT-WORD relation — encoding cost is vocabulary-bounded,
    and the whole encode is ONE declarative plan (the merges are fixed
    constants: no driver loop, no checkpoint, no Python workers).
    Compound rules whose left symbol is itself a merged token
    (e.g. ``("th", "e")`` after ``("t", "h")``) fold correctly — the
    accumulator comparison is length-aware."""
    words = _words(docs, text_col, max_word_len)
    for a, b in merges:
        words = _apply_merge(words, a, b)
    return (
        words.select(
            F.explode(F.split(F.col("syms"), US, -1)).alias("token"), "cnt"
        )
        .groupBy("token")
        .agg(F.sum("cnt").alias("tok_count"))
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = N_MERGES,
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """Learn the first ``n_merges`` merge rules; returns a DataFrame
    ``(rank INT, left_sym, right_sym, merged STRING, pair_count BIGINT)``
    ordered by rank. Ends early (fewer rows) if the corpus runs out of
    repeated pairs (pair_count must be >= 2 to merge)."""
    spark = docs.sparkSession
    words = track(_words(docs, text_col, max_word_len).localCheckpoint())
    rules = []
    for r in range(1, n_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.col("pc").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["pc"] < 2:
            break
        a, b, pc = best[0]["a"], best[0]["b"], int(best[0]["pc"])
        rules.append((r, a, b, a + b, pc))
        if r < n_merges:
            words = track(_apply_merge(words, a, b).localCheckpoint())
    return spark.createDataFrame(
        rules, "rank int, left_sym string, right_sym string, merged string, pair_count long"
    )
