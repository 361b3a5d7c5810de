"""Domain-level corpus filtering (the C4 / RefinedWeb "URL filtering"
stage): aggregate per-domain health signals, flag bad domains, and keep
or drop every page by its domain's verdict.

Real pipelines apply this BEFORE document-level dedup/quality passes —
a link farm or template mill is cheaper to kill at the domain level
than page by page (C4 used a blocklist; RefinedWeb §3.1 scores URLs
and drops whole domains). This build has no external blocklist (no
external data by mandate), so the verdict is computed from the corpus
itself: a domain is flagged when too much of it is exact-duplicate
content (template mill) or its pages are too thin (stub farm).

Reference parity: the reference app (backend/dedupe_script.py) has no
domain stage — this is part of the beyond-reference training-data
toolkit (SURVEY.md §6), same family as operators/decontam.py.

Scale notes (100 TB):
- Exact-dup marking shuffles once on a fixed-width ``sha2(text)`` key
  (map-side-combinable count — identical shape to exact_dup_groups).
- Per-domain aggregation shuffles on the domain key; partial
  aggregation absorbs mega-domains (a CDN host with 10^9 pages arrives
  at the reducer as per-partition partials, not raw rows).
- The stats relation is one row per DOMAIN — orders of magnitude
  smaller than the corpus — so the verdict join back to pages is a
  broadcast; the page side never shuffles for it. If the domain count
  ever outgrew broadcast range, drop the explicit broadcast() and AQE
  picks a shuffled join keyed on the same column.
- Everything is built-in expressions: no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_domain

__all__ = ["domain_stats", "domain_filter"]


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain health signals: ``(domain, n_docs, n_dup_docs,
    dup_frac, avg_chars)``.

    ``n_dup_docs`` counts the domain's pages whose EXACT text (sha2)
    appears >= 2 times anywhere in the corpus — cross-domain copies
    count on both sides, which is what a template-mill detector wants.
    ``dup_frac`` is the exact rational ``n_dup_docs / n_docs`` and
    ``avg_chars`` the mean text length; both rounded to 6 places so the
    relation is engine-portable.
    """
    pages = docs.select(
        F.col(id_col),
        url_domain(url_col).alias("domain"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("h"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("n_chars"),
    )
    # full count relation, NOT a broadcast of the dup subset: the number
    # of duplicated texts is unbounded at corpus scale, while this join
    # shuffles on the same 32-byte h key the aggregation just used, so
    # the exchange is reused and no relation crosses the driver.
    counts = pages.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    marked = pages.join(counts, "h")
    return (
        marked.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
        )
        .select(
            "domain",
            "n_docs",
            "n_dup_docs",
            F.round(
                F.col("n_dup_docs").cast("double") / F.col("n_docs"), 6
            ).alias("dup_frac"),
            "avg_chars",
        )
    )


def domain_filter(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_frac: float = 0.2,
    min_avg_chars: float = 150.0,
) -> DataFrame:
    """Per-page domain verdict: every input page with its domain's
    signals and a ``kept`` flag — ``False`` when the domain is flagged
    (``dup_frac >= max_dup_frac`` or ``avg_chars < min_avg_chars``).

    Returns ``(id_col, domain, n_docs, dup_frac, avg_chars, kept)``.
    Emitting the verdict per page (instead of anti-joining the drops
    away) keeps the operator auditable — the caller filters on ``kept``
    to materialize the cleaned corpus, and the drop REASON is still in
    the row.
    """
    stats = domain_stats(docs, url_col, id_col, text_col)
    flagged = (F.col("dup_frac") >= max_dup_frac) | (
        F.col("avg_chars") < min_avg_chars
    )
    verdict = stats.select(
        "domain", "n_docs", "dup_frac", "avg_chars", (~flagged).alias("kept")
    )
    pages = docs.select(F.col(id_col), url_domain(url_col).alias("domain"))
    return pages.join(F.broadcast(verdict), "domain").select(
        id_col, "domain", "n_docs", "dup_frac", "avg_chars", "kept"
    )
