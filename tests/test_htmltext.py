"""HTML → text extraction (functions/htmltext.py): two-tier parity on
the subset grammar, production-tier coverage beyond it (numeric charrefs),
and the north-star byte-identity invariant on the pages fixture."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dedupe_spark.functions.htmltext import (
    extract_text_py,
    href_count_expr,
    html_to_text_expr,
    html_to_text_udf,
)

SUBSET_PAGES = [
    "<html><body><p>hello   world</p></body></html>",
    "<html><head><style>p{x}</style><script>if(1<2){}</script></head>"
    "<body>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</body></html>",
    "<div><!-- secret --><span>kept</span></div>",
    '<a href="https://x.io/1">one</a> <A HREF=\'https://x.io/2\'>two</A>',
    "",
]


def test_expr_udf_parity_on_subset(spark):
    """Built-in tier == HTMLParser tier, byte-for-byte, on the documented
    subset grammar."""
    df = spark.createDataFrame(pd.DataFrame({"html": SUBSET_PAGES}))
    got = df.select(
        html_to_text_expr(F.col("html")).alias("e"),
        html_to_text_udf()(F.col("html")).alias("u"),
    ).collect()
    for r in got:
        assert r["e"] == r["u"], (r["e"], r["u"])


def test_python_reference_values(spark):
    assert extract_text_py(SUBSET_PAGES[0]) == "hello world"
    assert extract_text_py(SUBSET_PAGES[1]) == "a & b <tag> \"q\" 's' end"
    assert extract_text_py(SUBSET_PAGES[2]) == "kept"
    # production tier handles numeric character references (outside the
    # built-in subset contract)
    assert extract_text_py("<p>&#65;&#x42;</p>") == "AB"


def test_href_count(spark):
    df = spark.createDataFrame(pd.DataFrame({"html": SUBSET_PAGES}))
    counts = [
        r["n"] for r in df.select(href_count_expr(F.col("html")).alias("n")).collect()
    ]
    assert counts == [0, 0, 0, 2, 0]


def test_pages_fixture_byte_identity(spark):
    """The north-star invariant on the fixture corpus: extracted text per
    url is byte-identical to the text column MODULO the documented HTML
    whitespace-insignificance rule (runs collapse to one space) — the
    fixture deliberately injects \\n and double-space noise into text, so
    the comparison normalizes both sides identically; everything else
    must match byte-for-byte, on BOTH tiers."""
    from dedupe_spark.fixtures import make_pages
    from dedupe_spark.pipeline import pages_df

    pages_pd, _ = make_pages(n_base=120)
    df = pages_df(spark, pages_pd)
    norm = F.trim(F.regexp_replace(F.col("text"), "[ \t\n\r]+", " "))
    out = df.select(
        norm.alias("want"),
        html_to_text_expr(F.decode(F.col("html"), "UTF-8")).alias("ext_builtin"),
        html_to_text_udf()(F.decode(F.col("html"), "UTF-8")).alias("ext_parser"),
    )
    bad = out.where(
        (F.col("ext_builtin") != F.col("want"))
        | (F.col("ext_parser") != F.col("want"))
    ).count()
    assert bad == 0
