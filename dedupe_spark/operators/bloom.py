"""Deterministic relational Bloom filter (Bloom 1970) for cross-crawl
membership dedup.

The 100 TB question this answers: "has this page's text been seen in a
PRIOR crawl?" — the incremental-ingest front of exact dedup
(sources/ingest + operators/dedup cover within-corpus dedup; the
reference's per-file duplicate surfaces, dedupe_script.py, assume the
whole corpus is re-scanned). Joining a new crawl against trillions of
historical hashes shuffles the history every run; a Bloom filter is the
standard answer (CCNet/Dolma-style pipelines): the history compresses to
a fixed-size bit relation that BROADCASTS, membership becomes a map-side
probe, and false positives are one-sided (a "maybe seen" can be
re-checked or accepted as an over-drop; a "not seen" is certain).

Design, matching the module family's conventions (sketches.py HLL):

- **Deterministic, engine-portable hashing.** Positions come from md5
  via Kirsch–Mitzenmacher double hashing: ``h1`` = first 12 hex chars,
  ``h2`` = next 12 hex chars forced odd, position_i = (h1 + i·h2) mod
  m_bits. Pure hex/int arithmetic (≤ 2^51, exact in int64) that DuckDB
  re-derives verbatim — the filter is VALUE-oracled, not sanity-checked.
- **Relational state, 32-bit words in int64.** The filter is a
  DataFrame ``(word:int, bits:long)`` with 32 used bits per word:
  masks stay ≤ 2^31, so shifts/ors/ands never touch the int64 sign bit
  in either engine (DuckDB ``<<`` overflow vs Spark shiftleft wrap —
  sidestepped, not papered over).
- **Mergeable, map-side-combinable build.** ``groupBy(word).agg(
  bit_or(mask))``: bit_or is commutative/associative, so the build
  shuffles ≤ m_words rows per input partition regardless of input size,
  and :func:`bloom_merge` unions shard filters with another bit_or —
  per-crawl filters combine without re-reading crawls.
- **Broadcast probe.** ``bloom_contains`` explodes k probe positions
  per key and left-joins the (≤ m_words)-row filter broadcast; a probe
  never shuffles the input relation on a new key.

Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k for n inserted keys in
m bits (:func:`bloom_fpr`); optimal k = (m/n)·ln2. State is
``m_words × 12`` bytes — a 2^32-bit filter (≈ 0.5 GB, n≈4×10^8 at 1 %
FPR) still broadcasts; beyond that, partition the key space into
independent filters (the build is already per-word parallel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_positions",
    "bloom_build",
    "bloom_merge",
    "bloom_contains",
    "bloom_fpr",
]

WORD_BITS = 32  # used bits per int64 word: masks stay sign-safe everywhere


def bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of ``k`` bit positions in ``[0, m_bits)`` for a key column.

    Kirsch–Mitzenmacher: two 48-bit md5-derived hashes generate all k
    positions; ``h2 | 1`` keeps the stride odd so positions don't cycle
    early on power-of-two ``m_bits``.
    """
    h = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(h, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 13, 12), 16, 10).cast("long").bitwiseOR(
        F.lit(1).cast("long")
    )
    return F.array(*[(h1 + F.lit(i) * h2) % F.lit(m_bits) for i in range(k)])


def _word_mask(posname: str) -> tuple[Column, Column]:
    """word/mask split over a materialized ``pos`` column (by name:
    shiftleft's bit count must be a SQL expression — the Python wrapper
    only takes literals)."""
    word = F.expr(f"CAST({posname} DIV {WORD_BITS} AS INT)")
    mask = F.expr(
        f"SHIFTLEFT(CAST(1 AS BIGINT), CAST({posname} % {WORD_BITS} AS INT))"
    )
    return word, mask


def bloom_build(
    df: DataFrame, key_col: str, m_words: int = 256, k: int = 5
) -> DataFrame:
    """Build the filter state ``(word:int, bits:long)`` from a key column.

    NULL keys are skipped (a NULL is not a member). Output has at most
    ``m_words`` rows — the whole history of a crawl as a broadcastable
    relation.
    """
    m_bits = m_words * WORD_BITS
    pos = F.explode(
        bloom_positions(F.col(key_col), m_bits, k)
    ).alias("pos")
    word, mask = _word_mask("pos")
    return (
        df.where(F.col(key_col).isNotNull())
        .select(pos)
        .select(word.alias("word"), mask.alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """OR per-shard/per-crawl filters into one (same m_words/k required).

    The incremental-history shape: yesterday's filter ∪ today's delta
    filter, no re-scan of yesterday's crawl.
    """
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    df: DataFrame,
    id_col: str,
    key_col: str,
    filt: DataFrame,
    m_words: int = 256,
    k: int = 5,
    result_col: str = "maybe_seen",
) -> DataFrame:
    """(id, maybe_seen) membership probe against a built filter.

    ``maybe_seen`` false is CERTAIN absence (no false negatives);
    true is membership up to the filter's false-positive rate. The
    filter joins broadcast on ``word``; an absent word row means those
    bits are all zero (left join, coalesce 0). NULL keys probe false.

    ONE pass over ``df``: a NULL key emits a single NULL-position probe
    row via ``explode_outer`` (its word never joins, its hit is false) —
    no second scan of a possibly-100 TB relation just to emit the
    constant-false rows.
    """
    m_bits = m_words * WORD_BITS
    pos = F.explode_outer(
        F.when(
            F.col(key_col).isNotNull(),
            bloom_positions(F.col(key_col), m_bits, k),
        )
    ).alias("pos")
    word, mask = _word_mask("pos")
    probes = df.select(F.col(id_col), pos).select(
        id_col, F.col("pos"), word.alias("word")
    )
    hit = F.col("pos").isNotNull() & (
        F.coalesce(F.col("bits"), F.lit(0).cast("long")).bitwiseAND(mask)
        != 0
    )
    return (
        probes.join(F.broadcast(filt), "word", "left")
        .select(id_col, hit.alias("hit"))
        .groupBy(id_col)
        .agg(F.bool_and("hit").alias(result_col))
    )


def bloom_fpr(n_keys: int, m_words: int = 256, k: int = 5) -> float:
    """Theoretical false-positive rate for n inserted keys."""
    import math

    m = m_words * WORD_BITS
    return (1.0 - math.exp(-k * n_keys / m)) ** k


# ---------------------------------------------------------------------------
# DuckDB SQL twins (the queries.py oracle re-derives the filter verbatim)
# ---------------------------------------------------------------------------

_HEXD = "'0123456789abcdef'"


def hex12_sql(hcol: str, start: int) -> str:
    """BIGINT value of 12 hex chars of an md5 column at 1-based start
    (exact: < 2^48) — the SQL twin of ``conv(substring(h,start,12),16,10)``."""
    terms = " + ".join(
        f"(strpos({_HEXD}, substr({hcol}, {start + i}, 1)) - 1) * {16 ** (11 - i)}"
        for i in range(12)
    )
    return f"({terms})"


def positions_sql(hcol: str, ivar: str, m_bits: int) -> str:
    """SQL twin of :func:`bloom_positions` for probe index ``ivar``."""
    return (
        f"(({hex12_sql(hcol, 1)}) + {ivar} * (({hex12_sql(hcol, 13)}) | 1))"
        f" % {m_bits}"
    )


def word_mask_sql(posvar: str) -> tuple[str, str]:
    """SQL twin of the word/mask split (32 used bits per int64 word)."""
    return (
        f"CAST({posvar} // {WORD_BITS} AS INTEGER)",
        f"(CAST(1 AS BIGINT) << CAST({posvar} % {WORD_BITS} AS INTEGER))",
    )
