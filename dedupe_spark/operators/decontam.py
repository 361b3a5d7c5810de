"""Benchmark decontamination + duplicated-n-gram signals.

Training-data pipelines must (a) strip documents that overlap an eval
benchmark (GPT-3 appendix C / PaLM style n-gram collision checks) and
(b) measure how much of each document is boilerplate shared with the
rest of the corpus (RefinedWeb / CCNet "duplicated line fraction"
family). Both reduce to the same core relation — (doc, token-n-gram) —
so they live together here.

Reference parity: the reference app (backend/dedupe_script.py) dedupes
labeled records; these operators extend the same engine to the corpus-
hygiene ops a web-scale training pipeline runs before ER, per the build
brief's LLM-data-pipeline mandate.

Scale notes (100 TB):
- n-gram strings are heavy shuffle keys (an 8-token gram is ~50 bytes);
  every join/agg here keys on a fixed-width hash of the gram instead.
  Default ``xxhash64`` (8-byte key, JVM codegen); pass ``gram_key="md5"``
  when a bit-reproducible SQL twin matters more than key width (the
  driver oracle does).
- The benchmark side of decontamination is tiny in practice (eval sets
  are MBs, the corpus is TBs): ``broadcast_bench=True`` ships the bench
  gram keys to every executor and the contamination check becomes a
  map-side hash probe with NO shuffle of the corpus grams. Set it False
  only if the "benchmark" is itself a large corpus.
- ``dup_ngram_ratio`` shuffles the gram relation once on the gram key
  (map-side-combinable count) and joins back on the same key; AQE reuses
  the exchange, so the corpus body moves over the wire once.
- Per-doc gram arrays are ``array_distinct``-ed inside the row before
  exploding: set semantics, and the explode volume is bounded by tokens
  per doc, not tokens², all JVM-side (no Python in the path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_ngram_array(col: str, n: int = 8) -> Column:
    """Distinct space-joined token n-grams of ``col`` (JVM-side only).

    Documents shorter than ``n`` tokens yield ONE gram — the whole
    document — so short docs still participate in overlap checks
    (matching the GPT-3 rule of checking short items verbatim) instead
    of silently vanishing from the relation.
    """
    toks = F.split(F.trim(F.col(col)), r"\s+")
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def _gram_key(gram: Column, gram_key: str) -> Column:
    if gram_key == "md5":
        return F.md5(gram)
    if gram_key == "xxhash64":
        return F.xxhash64(gram)
    raise ValueError(f"gram_key must be 'xxhash64' or 'md5', got {gram_key!r}")


def doc_grams(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    gram_key: str = "xxhash64",
) -> DataFrame:
    """(id_col, k) — one row per distinct token-n-gram per document.

    NULL/whitespace-only texts emit NO grams (they would otherwise all
    share one degenerate gram — xxhash64(NULL) = the seed — and
    cross-"contaminate" each other, while md5(NULL) keys silently
    vanished: two divergent behaviors for the same bad input)."""
    txt = F.col(text_col)
    return (
        docs.where(txt.isNotNull() & (F.trim(txt) != ""))
        .select(
            F.col(id_col),
            F.explode(token_ngram_array(text_col, n)).alias("gram"),
        )
        .select(id_col, _gram_key(F.col("gram"), gram_key).alias("k"))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    gram_key: str = "xxhash64",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Documents sharing >= 1 token-n-gram with a benchmark set.

    Returns (id_col, n_hit_ngrams, n_bench_docs): how many distinct
    grams collide and how many distinct benchmark docs are touched —
    enough to drive either a hard drop or a contamination report. Docs
    with zero overlap are absent (filter with a left_anti join on the
    result to keep the clean ones).

    The benchmark side is deduped to (bench_id, k) before the join; with
    ``broadcast_bench`` the corpus grams never shuffle.
    """
    g = doc_grams(docs, id_col, text_col, n, gram_key)
    bg = (
        doc_grams(
            bench.withColumnRenamed(id_col, "bench_id"),
            "bench_id",
            text_col,
            n,
            gram_key,
        )
        .distinct()
    )
    if broadcast_bench:
        bg = F.broadcast(bg)
    return (
        g.join(bg, "k")
        .groupBy(id_col)
        .agg(
            F.countDistinct("k").alias("n_hit_ngrams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


def dup_ngram_ratio(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    gram_key: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-n-gram fraction across the whole corpus.

    (id_col, n_ngrams, n_dup_ngrams, dup_ratio) where a gram is "dup"
    if it appears in >= 2 distinct documents. The RefinedWeb-style
    boilerplate signal: a page whose grams mostly exist elsewhere is
    template, not content. Grams are distinct-per-doc, so the global
    count per gram IS its document frequency — a plain map-side-
    combinable count, no countDistinct shuffle.
    """
    g = doc_grams(docs, id_col, text_col, n, gram_key)
    df_counts = g.groupBy("k").agg(F.count(F.lit(1)).alias("df"))
    return (
        g.join(df_counts, "k")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias(
                "n_dup_ngrams"
            ),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_dup_ngrams",
            F.round(
                F.col("n_dup_ngrams").cast("double") / F.col("n_ngrams"), 6
            ).alias("dup_ratio"),
        )
    )

# keep-first tie-break encoding for dup_line_scrub: one BIGINT per line
# occurrence, doc_id * RANGE + pos. Bounds: < 2^22 lines per document and
# numeric doc ids < 2^41 — both comfortably above real web pages; the
# encoding keeps the per-line argmin a map-side-combinable MIN instead of
# a window over the (skew-prone) line-hash partition.
_ENC_POS_RANGE = 1 << 22


def dup_line_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    keep_first: bool = True,
    line_key: str = "xxhash64",
) -> DataFrame:
    """Remove lines duplicated across documents (CCNet's first pipeline
    stage, Wenzek et al. 2020 §3.1: hash every paragraph, drop repeats
    corpus-wide — the nav-bar/footer/cookie-banner killer that runs
    BEFORE any document-level near-dup pass; RefinedWeb keeps the same
    signal as its "duplicated line fraction").

    A line occurrence is *duplicated* when its normalized form
    (lowercased, horizontal whitespace collapsed, trimmed) appears in
    >= ``min_df`` distinct documents. With ``keep_first=True`` (CCNet's
    global-hash-set semantics made deterministic) exactly ONE occurrence
    of each duplicated line survives — the one with the smallest
    ``(doc_id, line position)`` — and every other occurrence, including
    within-doc repeats, is dropped; requires a numeric ``id_col`` (the
    tie-break is encoded as ``doc_id * 2^22 + pos``, module constant).
    With ``keep_first=False`` ALL occurrences are removed (pure
    boilerplate scrub). Blank / whitespace-only lines are structure, not
    content: never counted, never removed. Returns one row per input
    document: ``(id_col, clean_text, n_lines, n_removed)``.

    Scale notes (100 TB): every shuffle keys on a fixed-width hash of
    the normalized line (``xxhash64`` prod / ``md5`` for the
    bit-reproducible SQL twin, module docstring). Document frequency and
    the keep-first argmin come from a two-level cascade —
    ``(key, doc) -> min(enc)`` then ``key -> (count, min)`` — so both
    are partial-aggregated map-side and a nav line shared by a billion
    pages never funnels raw occurrences through one reducer (a
    ``row_number`` window over the key WOULD). The dup relation carries
    only keys past ``min_df``; the occurrence side joins it once and
    reassembles per document with JVM array lambdas — no Python UDF.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
        ).alias("pos", "line"),
    )
    norm = F.trim(F.regexp_replace(F.lower(F.col("line")), "[ \t\r]+", " "))
    occ = lines.select(
        id_col,
        "pos",
        "line",
        F.when(F.length(norm) > 0, _gram_key(norm, line_key)).alias("k"),
    )
    enc = F.col(id_col).cast("long") * F.lit(_ENC_POS_RANGE) + F.col("pos")
    perdoc = (
        occ.where(F.col("k").isNotNull())
        .groupBy("k", id_col)
        .agg(F.min(enc).alias("e"))
    )
    dup = (
        perdoc.groupBy("k")
        .agg(F.count(F.lit(1)).alias("df"), F.min("e").alias("keep_e"))
        .where(F.col("df") >= min_df)
        .select("k", "keep_e")
    )
    joined = occ.join(dup, "k", "left")
    is_dup = F.col("keep_e").isNotNull()
    removed = is_dup & (enc != F.col("keep_e")) if keep_first else is_dup
    return joined.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("pos").alias("pos"),
                                F.when(removed, F.lit(None))
                                .otherwise(F.col("line"))
                                .alias("line"),
                            )
                        )
                    ),
                    lambda s: s["line"].isNotNull(),
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(removed.cast("int")).cast("long").alias("n_removed"),
    )


def dup_span_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_df: int = 2,
    gram_key: str = "xxhash64",
) -> DataFrame:
    """Remove cross-document duplicated word spans from each document
    (the word-granularity cousin of ExactSubstr dedup: Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"; also the
    removal step RefinedWeb applies after measuring what
    :func:`dup_ngram_ratio` measures).

    A word position is *covered* when any token-``n``-gram window that
    contains it occurs in >= ``min_df`` distinct documents; covered words
    are dropped and the survivors are re-joined with single spaces.
    Returns ``(id_col, clean_text, n_words, n_removed)`` — one row per
    input document (untouched docs come back with ``n_removed = 0``;
    docs shorter than ``n`` tokens have no window and are never
    scrubbed).

    Scale notes (100 TB): the positional gram relation is linear in
    corpus tokens and keys every shuffle on a fixed-width gram hash
    (``xxhash64`` default, ``md5`` for the bit-reproducible SQL twin —
    module docstring). Document frequency is computed on the
    distinct-per-doc projection (map-side-combinable count, no
    countDistinct shuffle); only grams that pass ``min_df`` flow into
    the covered-position explode, so the cover relation is bounded by
    ``n`` x duplicated-gram occurrences, not corpus size. Reassembly is
    one groupBy(doc) collect_set plus JVM-side array lambdas — no
    Python, no per-row UDF.

    The gram relation is deliberately re-derived from the (column-pruned)
    scan on each side of the doc-frequency join instead of being
    persisted: materializing it would cost ~``n``x the corpus in
    executor storage, while the distinct + map-side-combinable count
    keeps every shuffle skew-safe even for boilerplate grams shared by
    millions of documents (a window-over-``k`` formulation would scan
    once but funnel a mega-gram's rows through one reducer).
    """
    # coalesce: a NULL text must behave like '' (one row back, nothing
    # scrubbed) — unguarded, split(NULL) propagates NULL through size()/
    # filter() and the row returns NULL columns while the SQL twin's
    # UNNEST drops it entirely
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    base = docs.select(F.col(id_col), toks.alias("ws"))
    grams = (
        base.where(F.size("ws") >= n)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - (n - 1)),
                    lambda i: F.array_join(F.slice("ws", i, n), " "),
                )
            ).alias("pos0", "gram"),
        )
        .select(
            id_col,
            (F.col("pos0") + 1).alias("pos"),
            _gram_key(F.col("gram"), gram_key).alias("k"),
        )
    )
    dup = (
        grams.select(id_col, "k")
        .distinct()
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .select("k")
    )
    covered = (
        grams.join(dup, "k")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("cpos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("cpos").alias("cov"))
    )
    empty = F.array().cast("array<int>")
    cov = F.coalesce(F.col("cov"), empty)
    return base.join(covered, id_col, "left").select(
        id_col,
        F.array_join(
            F.filter("ws", lambda w, i: ~F.array_contains(cov, i + 1)),
            " ",
        ).alias("clean_text"),
        F.size("ws").cast("long").alias("n_words"),
        F.size(cov).cast("long").alias("n_removed"),
    )

