"""Domain-level filtering operators (operators/domains.py + urls.url_domain)."""

from __future__ import annotations

from dedupe_spark.functions.urls import url_domain
from dedupe_spark.operators import domains as D


def _pages(spark, rows):
    return spark.createDataFrame(
        [(int(i), u, t) for i, u, t in rows],
        "doc_id long, url string, text string",
    )


def test_url_domain_extraction(spark):
    df = spark.createDataFrame(
        [
            ("HTTP://WWW.Example7.COM:80/path?a=1",),
            ("https://user@sub.site.org/x#f",),
            ("not a url",),
            ("http://www.w3.org",),
        ],
        "u string",
    )
    got = [r[0] for r in df.select(url_domain("u")).collect()]
    assert got == ["example7.com", "sub.site.org", "", "w3.org"]


def test_domain_stats_counts_cross_domain_dups(spark):
    docs = _pages(
        spark,
        [
            (1, "http://a.com/1", "same body"),
            (2, "http://a.com/2", "same body"),
            (3, "http://b.com/1", "same body"),   # cross-domain copy counts
            (4, "http://b.com/2", "original text here"),
        ],
    )
    got = {r["domain"]: r for r in D.domain_stats(docs).collect()}
    assert (got["a.com"]["n_docs"], got["a.com"]["n_dup_docs"]) == (2, 2)
    assert (got["b.com"]["n_docs"], got["b.com"]["n_dup_docs"]) == (4 - 2, 1)
    assert got["a.com"]["dup_frac"] == 1.0
    assert got["b.com"]["dup_frac"] == 0.5


def test_domain_filter_verdicts(spark):
    long_txt = "x" * 200
    docs = _pages(
        spark,
        # mill.com: both pages identical -> dup_frac 1 -> dropped
        [(1, "http://mill.com/1", long_txt), (2, "http://mill.com/2", long_txt)]
        # thin.com: unique but short -> avg_chars < 150 -> dropped
        + [(3, "http://thin.com/1", "tiny"), (4, "http://thin.com/2", "wee")]
        # ok.com: unique and long -> kept
        + [
            (5, "http://ok.com/1", long_txt + "a"),
            (6, "http://ok.com/2", long_txt + "b"),
        ],
    )
    got = {r["doc_id"]: r for r in D.domain_filter(docs).collect()}
    assert len(got) == 6  # verdict is per page, nothing silently dropped
    assert not got[1]["kept"] and not got[2]["kept"]
    assert not got[3]["kept"] and not got[4]["kept"]
    assert got[5]["kept"] and got[6]["kept"]
    assert got[5]["dup_frac"] == 0.0 and got[5]["avg_chars"] == 201.0
