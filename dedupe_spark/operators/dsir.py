"""DSIR-style data selection via hashed n-gram importance weights
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"): featurize every document as a bag of hashed word unigrams
and bigrams, fit bucket-level unigram distributions for a TARGET domain
and the RAW pool, and score each raw document by its importance
log-ratio  sum_b count_b · ln(p_target[b] / p_raw[b]).  DSIR proper then
Gumbel-resamples by these weights; the deterministic engine form emits
the exact integer score (micro-nats) and a threshold flag so selection
is a pure downstream filter — the resampling draw is the only part left
to the caller (operators/sampling.py's md5-rational A-ES keys are the
deterministic device for that).

Reference parity note: the reference app (backend/dedupe_script.py) has
no data-selection stage — this extends the beyond-reference
training-data toolkit (SURVEY.md §6), same family as operators/lm.py
(distributional quality) and decontam.py (benchmark overlap).

No external data: the "target domain" is a deterministic md5-keyed
corpus slice (first hex digit of md5(doc_id) < '4' — 1/4 of docs), the
same self-contained idiom trigram_lm_score and decontaminate_ngrams use
for their reference slices. Scores are emitted for the complementary
RAW slice only, mirroring DSIR's select-from-raw-toward-target setup.

Scale design (the 100 TB story):
- The MODEL is fixed-size by construction: features hash into
  ``n_buckets`` (default 4096) buckets, so both distribution relations
  are at most ``n_buckets`` rows regardless of corpus size — the
  log-ratio table broadcasts to the scoring join; the corpus side never
  shuffles on a feature key.
- One explode produces the (doc, bucket, count) stream with partial
  aggregation (wire volume = distinct buckets per doc, capped at
  ``n_buckets``); the bucket-level target/raw counts fold off the same
  stream map-side-combinably (output ≤ n_buckets rows).
- Engine-portable floats: each bucket's log-ratio is quantized to
  integer micro-nats (``round(ln(·)·1e6)`` BIGINT) BEFORE the per-doc
  sum — exact integer arithmetic, partition-order-independent,
  identical in Spark and DuckDB (the operators/lm.py device).
- Hashing is md5-u31 mod n_buckets — deterministic, unseeded, and
  re-derivable bit-for-bit in the SQL twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..lifecycle import track

__all__ = [
    "dsir_scores",
    "N_BUCKETS",
    "TARGET_HEX",
    "TOKEN_SPLIT_RE",
]

# feature buckets: the fixed model size. 4096 is small enough that the
# log-ratio table is always a broadcast, large enough that web-scale
# vocab collisions average out (DSIR's own default is 10^4 buckets).
N_BUCKETS = 4096

# md5(doc_id) first-hex digits that define the target slice (1/4).
TARGET_HEX = ("0", "1", "2", "3")

# tokenization: split on whitespace runs — the corpus-wide convention
# (same class the simhash/minhash token paths use; explicit char class
# keeps Java-regex and DuckDB-RE2 semantics identical).
TOKEN_SPLIT_RE = "[ \t\n\r]+"


def _u31_mod_bucket(col: Column, n_buckets: int) -> Column:
    """First 8 md5 hex chars as u31, mod n_buckets (the engine-portable
    unseeded hash — queries._hex_u31_sql is the SQL twin)."""
    u31 = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % F.lit(
        2147483648
    )
    return (u31 % F.lit(n_buckets)).cast("int")


def _features(docs: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    """(_id, is_target, bucket, cnt) — hashed unigram+bigram occurrence
    counts per document. The token array is built once per row; unigrams
    and bigrams concatenate into one feature array before a single
    explode, so the corpus text is scanned exactly once."""
    toks = F.split(
        F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), TOKEN_SPLIT_RE
    )
    d = docs.select(
        F.col(id_col).alias("_id"),
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
        .isin(*TARGET_HEX)
        .alias("is_target"),
        F.filter(toks, lambda t: t != F.lit("")).alias("tk"),
    )
    bigrams = F.expr(
        "transform(slice(tk, 1, greatest(size(tk) - 1, 0)),"
        " (t, i) -> concat(t, ' ', tk[i + 1]))"
    )
    feats = F.concat(F.col("tk"), bigrams)
    return (
        d.where(F.size("tk") > 0)
        .select("_id", "is_target", F.explode(feats).alias("ft"))
        .select("_id", "is_target", _u31_mod_bucket(F.col("ft"), n_buckets).alias("bucket"))
        .groupBy("_id", "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Score every RAW-slice document by its DSIR importance log-ratio.

    Returns ``(doc_id, n_feats BIGINT, dsir_unats BIGINT, selected
    BOOLEAN)`` — ``dsir_unats`` is the exact integer micro-nat sum
    ``Σ_b cnt_b · round(ln(p_t[b]/p_r[b])·1e6)`` with add-one smoothing
    over ``n_buckets`` buckets. ``selected`` flags docs scoring ABOVE
    THE RAW-POOL MEAN: raw importance log-ratios are typically all
    negative (every raw doc carries features dense in the raw pool
    itself), so an absolute zero threshold selects nothing — the mean is
    a corpus-relative cut that needs only one scalar aggregate (no
    global sort/window, scale-safe; DSIR proper resamples by these
    weights, which operators/sampling.py's deterministic A-ES keys can
    consume downstream). The mean compare is float-on-exact-ints —
    identical in both engines; the int sum feeding it has int64 headroom
    to ~10^9 docs at ~10^7 unats each, DECIMAL(38) is the documented
    beyond-that choice (same trade as queries.q_pricing_summary).
    Documents with no tokens score 0 and are kept (left join re-attaches
    them before the mean is taken).
    """
    # cached: the feature stream feeds the model aggregation AND the
    # per-doc scoring — without the cache each consumer re-runs the
    # corpus explode (the winnowing lesson: a shared kernel relation
    # must be materialized once). Tracked for lifecycle release.
    feats = track(_features(docs, id_col, text_col, n_buckets).cache())
    # bucket-level distributions fold off the SAME feature stream —
    # output <= n_buckets rows, map-side combinable. Scalar totals ride
    # along via a window-free cross join of one aggregated row.
    bstats = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(F.lit(0))).alias("c_t"),
        F.sum(F.when(~F.col("is_target"), F.col("cnt")).otherwise(F.lit(0))).alias("c_r"),
    )
    totals = bstats.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    # log-ratio per bucket in integer micro-nats: the only float op, on
    # identical integer inputs in both engines, quantized before the sum.
    lr = bstats.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log(
                ((F.col("c_t") + 1) / (F.col("n_t") + F.lit(n_buckets)))
                / ((F.col("c_r") + 1) / (F.col("n_r") + F.lit(n_buckets)))
            )
            * 1e6,
            0,
        )
        .cast("long")
        .alias("lr_unats"),
    )
    raw_scores = (
        feats.where(~F.col("is_target"))
        .join(F.broadcast(lr), "bucket")
        .groupBy("_id")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sum(F.col("cnt") * F.col("lr_unats")).alias("dsir_unats"),
        )
    )
    raw_docs = docs.select(F.col(id_col).alias("_id")).where(
        ~F.substring(F.md5(F.col(id_col).cast("string")), 1, 1).isin(*TARGET_HEX)
    )
    # cached: read twice (the mean scalar + the output projection)
    scored = track(
        raw_docs.join(raw_scores, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce(F.col("dsir_unats"), F.lit(0)).cast("long").alias("dsir_unats"),
        )
        .cache()
    )
    mean = scored.agg(F.avg("dsir_unats").alias("mean_unats"))
    return scored.crossJoin(F.broadcast(mean)).select(
        id_col,
        "n_feats",
        "dsir_unats",
        (F.col("dsir_unats") > F.col("mean_unats")).alias("selected"),
    )
