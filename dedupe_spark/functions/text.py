"""Text-analysis functions for large-scale training-data pipelines.

Beyond the reference's operator set (SURVEY.md §2) these are the document-
processing primitives a 100 TB web-text pipeline needs: token counting,
quality scoring, language identification, and document fingerprinting —
each applied over a ``documents``-shaped table (doc_id, text, lang, ...).

Design rule: everything that CAN be a built-in Column expression IS one
(whole-stage codegen, no Python in the hot path); only the n-gram language
model needs an Arrow-batched pandas UDF. Every Column builder here has a
DuckDB SQL twin (suffix ``_sql``) used by the driver's correctness oracle.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# Token counting (whitespace + a BPE-ish regex variant)
# ---------------------------------------------------------------------------


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/null."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(
        t.isNull() | (t == ""), F.lit(0)
    ).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def token_count_sql(expr: str) -> str:
    return (
        f"CASE WHEN {expr} IS NULL OR trim({expr}) = '' THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({expr}), '\\s+')) END"
    )


# BPE-ish subword proxy: word pieces, numbers, and single non-space symbols —
# the regex families GPT-2/tiktoken-style tokenizers start from.
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def subword_count(col: Column | str) -> Column:
    """Count of BPE-ish pieces (letter runs, digit runs, single symbols)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.size(F.regexp_extract_all(c, F.lit(_BPE_RE), 0)), F.lit(0)
    ).cast("long")


def subword_count_sql(expr: str) -> str:
    return (
        f"coalesce(len(regexp_extract_all({expr}, "
        f"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]')), 0)"
    )


# ---------------------------------------------------------------------------
# Quality scoring: length / punctuation / stopword / repetition signals
# ---------------------------------------------------------------------------

# Tiny embedded English stopword list (public-domain standard list prefix).
STOPWORDS_EN = (
    "the of and a to in is it that for on with as are was at be this have "
    "from or by not but they his her she he you we an their has had were "
    "which when who will more no if out so said what up its about than into "
    "them can only other new some could time these two may then do first any "
    "my now such like our over man me even most made after also did many"
).split()


def quality_features(col: Column | str) -> dict[str, Column]:
    """Column map of quality signals over a text column.

    n_chars, n_tokens, mean_token_len, punct_ratio (punctuation chars /
    chars), stopword_ratio (EN stopword tokens / tokens), digit_ratio,
    uniq_token_ratio. All built-ins — no Python.
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    toks = F.split(t, r"\s+")
    n_tok = token_count(c)
    n_chars = F.length(c).cast("long")
    punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_sw = F.size(
        F.filter(toks, lambda x: F.array_contains(sw, F.lower(x)))
    )
    n_uniq = F.size(F.array_distinct(F.transform(toks, F.lower)))
    safe_tok = F.greatest(n_tok, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": (
            (n_chars - (n_tok - 1)) / safe_tok
        ).cast("double"),
        "punct_ratio": (punct / safe_chars).cast("double"),
        "digit_ratio": (digits / safe_chars).cast("double"),
        "stopword_ratio": (n_sw / safe_tok).cast("double"),
        "uniq_token_ratio": (n_uniq / safe_tok).cast("double"),
    }


def add_quality_features(df, col: str, prefix: str = "q_"):
    out = df
    for name, expr in quality_features(col).items():
        out = out.withColumn(prefix + name, expr)
    return out


def quality_score(col: Column | str) -> Column:
    """Scalar quality score in [0,1]: heuristic blend of the signals —
    long-enough, readable-punctuation, some stopwords, low repetition."""
    q = quality_features(col)
    len_term = F.least(q["n_tokens"] / F.lit(20.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(q["punct_ratio"] * 4.0, F.lit(1.0))
    sw_term = F.least(q["stopword_ratio"] * 3.0, F.lit(1.0))
    rep_term = q["uniq_token_ratio"]
    return (
        (len_term * 0.3 + punct_term * 0.25 + sw_term * 0.2 + rep_term * 0.25)
    ).cast("double")


# ---------------------------------------------------------------------------
# Language identification — stopword-hit heuristic (SQL-twinned) and a
# char-n-gram scorer (pandas UDF) for harder inputs
# ---------------------------------------------------------------------------

# Minimal high-frequency function-word lists per language (public knowledge).
LANG_MARKERS: dict[str, list[str]] = {
    "en": "the and of to in is that it for with as was on are this".split(),
    "de": "der die das und ist nicht ein eine zu den von mit sich des".split(),
    "fr": "le la les de des et un une est dans que pour sur avec".split(),
    "es": "el la los las de y un una es en que por con para del".split(),
    "pl": "i w nie na si to jest z do o a e po dla przez jak".split(),
}


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit count Columns (built-in ops only)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    out = {}
    for lang, words in LANG_MARKERS.items():
        marker = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda x: F.array_contains(marker, x)))
    return out


def lang_id(col: Column | str, default: str = "und") -> Column:
    """argmax over lang_scores; 'und' when no marker hits at all.

    Deterministic tie-break: language order as listed in LANG_MARKERS.
    """
    scores = lang_scores(col)
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang, s in scores.items():
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def _ngram_profile(text: str, n: int = 3, top: int = 64) -> list[str]:
    s = " " + " ".join(text.lower().split()) + " "
    counts: dict[str, int] = {}
    for i in range(max(len(s) - n + 1, 0)):
        g = s[i : i + n]
        counts[g] = counts.get(g, 0) + 1
    return [g for g, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top]]


def make_ngram_lang_udf(profiles: dict[str, list[str]], n: int = 3):
    """Char-n-gram language scorer: rank-distance to per-language profiles
    (Cavnar & Trenkle 1994 'N-Gram-Based Text Categorization'). ``profiles``
    maps lang -> ranked n-gram list (train with :func:`_ngram_profile` on any
    sample corpus). Arrow-batched; use when stopword hits are too sparse."""
    ranks = {
        lang: {g: i for i, g in enumerate(prof)} for lang, prof in profiles.items()
    }
    max_rank = max((len(p) for p in profiles.values()), default=1)

    @pandas_udf(StringType())
    def _lang(texts: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return "und"
            prof = _ngram_profile(t, n=n, top=max_rank)
            best, best_d = "und", math.inf
            for lang, r in ranks.items():
                d = sum(abs(i - r.get(g, max_rank)) for i, g in enumerate(prof))
                if d < best_d:
                    best, best_d = lang, d
            return best

        return texts.map(one)

    return _lang


# ---------------------------------------------------------------------------
# Corpus IDF (for the TF-IDF cosine comparator, dedupe's Text variable)
# ---------------------------------------------------------------------------


def compute_idf(
    df, col: str, top_k: int = 1 << 18, min_df: int = 2
) -> tuple[dict[str, float], float]:
    """Distributed document-frequency aggregation -> bounded driver IDF dict.

    idf(t) = ln(N / (1 + df_t)) + 1 (smoothed). Only the ``top_k`` most
    frequent tokens are materialized (executor-memory-bounded broadcast);
    everything rarer shares ``default_idf`` = the idf of a min_df-frequency
    token — rare tokens are maximally discriminative and indistinguishable
    from each other for weighting purposes. Returns (idf_dict, default_idf).
    """
    import math

    from pyspark.sql import functions as F  # local: keep module import light

    n_docs = df.count()
    dfreq = (
        df.select(
            F.explode(
                F.array_distinct(F.split(F.trim(F.col(col)), r"\s+"))
            ).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .orderBy(F.desc("df"), F.asc("tok"))
        .limit(top_k)
        .collect()
    )
    idf = {
        r["tok"]: math.log(n_docs / (1.0 + r["df"])) + 1.0 for r in dfreq
    }
    default_idf = math.log(n_docs / (1.0 + min_df)) + 1.0
    return idf, default_idf


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(col: Column | str, mod: int = (1 << 61) - 1) -> Column:
    """Deterministic position-weighted token fingerprint (built-ins only;
    SQL-twinned). Sum over tokens of (pos+1) * (96*len(tok) + ascii(first
    char)) mod m — an order-sensitive document signature cheap enough to run
    at scan speed. For similarity-preserving fingerprints use simhash
    (functions.strings.simhash64) instead; this one is for exact/positional
    identity and fast change detection."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    term = F.transform(
        toks,
        lambda x, i: (i + F.lit(1)).cast("long")
        * (F.length(x) * 96 + F.ascii(F.substring(x, 1, 1))).cast("long"),
    )
    s = F.aggregate(term, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return F.when(
        c.isNull() | (F.trim(c) == ""), F.lit(0).cast("long")
    ).otherwise(F.pmod(s, F.lit(mod)).cast("long"))


def fingerprint_sql(expr: str, mod: int = (1 << 61) - 1) -> str:
    toks = f"regexp_split_to_array(trim({expr}), '\\s+')"
    # DuckDB index lambdas are 1-based; Spark's F.transform index is 0-based,
    # so the Spark side uses (i+1) and both weight token t by its 1-based pos.
    term = (
        f"list_transform({toks}, (x, i) -> CAST(i AS BIGINT) * "
        f"(96*len(x) + CASE WHEN len(x)=0 THEN 0 ELSE ord(x[1]) END))"
    )
    s = f"list_sum({term})"
    return (
        f"CASE WHEN {expr} IS NULL OR trim({expr}) = '' THEN 0 "
        f"ELSE CAST(({s} % {mod} + {mod}) % {mod} AS BIGINT) END"
    )


def rolling_hashes(text: str, window: int = 8, base: int = 257,
                   mod: int = (1 << 61) - 1) -> list[int]:
    """Karp-Rabin rolling hashes of every char window (scalar kernel; used
    inside winnowing_fingerprints)."""
    if len(text) < window:
        return [_poly_hash(text, base, mod)] if text else []
    out = []
    h = _poly_hash(text[:window], base, mod)
    out.append(h)
    top = pow(base, window - 1, mod)
    for i in range(window, len(text)):
        h = (h - ord(text[i - window]) * top) % mod
        h = (h * base + ord(text[i])) % mod
        out.append(h)
    return out


def _poly_hash(s: str, base: int, mod: int) -> int:
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % mod
    return h


def winnowing_fingerprints(text: str, window: int = 8, stride: int = 4) -> list[int]:
    """Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003): min rolling
    hash per stride window — a compact near-dup fingerprint set."""
    hs = rolling_hashes(text, window)
    if not hs:
        return []
    out = []
    for i in range(0, len(hs), stride):
        out.append(min(hs[i : i + stride]))
    return sorted(set(out))


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters, Rae et al. 2021 §A1.1)
# ---------------------------------------------------------------------------


def repetition_scores(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-document word-repetition signals for quality filtering:

    - ``top_unigram_frac``  — occurrences of the most frequent token / n
    - ``top_bigram_frac``   — occurrences of the most frequent bigram / (n-1)
    - ``dup_bigram_frac``   — fraction of bigram occurrences that are repeats

    High values flag boilerplate/spam/SEO word soup (the Gopher rules drop
    docs with top-2-gram fraction > 0.2 etc.). Distributed shape: explode →
    count per (doc, gram) → per-doc max, keyed by doc id throughout — the
    shuffles partition by document, so the stage scales linearly in corpus
    size with no skew beyond document length. The tempting shuffle-free
    alternative (higher-order functions: for each distinct token, filter +
    size over the token array) is O(n·distinct) PER ROW — quadratic in
    document length, hostile at web scale; the explode is the right plan.
    """
    # NULL text behaves as '' (one empty token, n=1, fracs 1/0/0) — the
    # same coalesce is in the SQL twin; without it Spark's size(null)=-1
    # diverges from DuckDB's len(NULL)=NULL the moment a null row appears
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    base = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .withColumn(
            "bgs",
            F.when(
                F.col("n") >= 2,
                F.transform(
                    # sequence(1, n-1) is 1-based; guard n>=2 above because
                    # sequence(1, 0) would generate the DESCENDING [1, 0]
                    F.sequence(F.lit(1), F.col("n") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("toks", i),
                        F.element_at("toks", i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    # explode_outer + post-generate null filter, NOT plain explode:
    # InferFiltersFromGenerate would duplicate the entire gram-building
    # expression into a size(...) > 0 pre-filter under an inner explode —
    # the bigram transform evaluated twice per document (the built-in-
    # expression analog of the bands-UDF asNondeterministic fix in
    # blocking.minhash_bands_udf); the rule skips outer generates, and
    # dropping the generated NULL of an empty array afterwards restores
    # inner-explode semantics for the price of a trivial filter
    uni = (
        base.select("doc_id", F.explode_outer("toks").alias("g"))
        .where(F.col("g").isNotNull())
        .groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("c1max"))
    )
    bi = (
        base.select("doc_id", F.explode_outer("bgs").alias("g"))
        .where(F.col("g").isNotNull())
        .groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max("count").alias("c2max"),
            F.count("*").alias("d2"),
            F.sum("count").alias("m"),
        )
    )
    n1 = F.greatest(F.col("n"), F.lit(1)).cast("double")
    m1 = F.greatest(F.col("n") - 1, F.lit(1)).cast("double")
    return (
        base.select("doc_id", "n")
        .join(uni, "doc_id", "left")
        .join(bi, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.round(F.coalesce("c1max", F.lit(0)) / n1, 6).alias(
                "top_unigram_frac"
            ),
            F.round(F.coalesce("c2max", F.lit(0)) / m1, 6).alias(
                "top_bigram_frac"
            ),
            F.round(
                (F.coalesce("m", F.lit(0)) - F.coalesce("d2", F.lit(0))) / m1, 6
            ).alias("dup_bigram_frac"),
        )
    )
