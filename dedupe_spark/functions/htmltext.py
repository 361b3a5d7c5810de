"""HTML → text extraction — the FIRST stage of the north-star pipeline
(BASELINE.json input_hint carries ``html: binary`` alongside ``text``;
the north rule's per-row invariant is byte-identical extracted text per
url). Two tiers, the engine's established xxhash-vs-md5 dual pattern:

- :func:`html_to_text_expr` — pure built-in regexp chain (JVM
  whole-stage codegen, zero Python) over a DOCUMENTED HTML subset:
  strips comments / script / style blocks, replaces tags with spaces,
  decodes the six ubiquitous named entities, collapses whitespace. Every
  step is re-derivable verbatim in DuckDB → full value oracles.
- :func:`html_to_text_udf`-produced column — the production extractor:
  Python's stdlib ``html.parser.HTMLParser`` in an Arrow-batched pandas
  UDF. Handles what no regexp subset can (numeric character references,
  attribute values containing ``>``, CDATA, broken nesting) while
  keeping the same output contract (space-joined data runs, collapsed
  whitespace). On the subset grammar the two tiers agree byte-for-byte
  (test_htmltext parity).

Scale notes: both tiers are stateless row projections — no shuffle, no
driver state; the UDF ships nothing but the column (Arrow batches).
The regexp tier stays in codegen and is the default for pipelines whose
corpora are known subset-clean; the parser tier is the web-crawl
default. Link extraction (:func:`href_count_expr`) is a built-in
``regexp_extract_all`` — the input to the URL-graph family
(functions/urls.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

__all__ = [
    "html_to_text_expr",
    "html_to_text_udf",
    "href_count_expr",
    "extract_text_py",
]

# the six entities the built-in tier decodes (subset contract); &amp;
# must decode LAST so '&amp;lt;' round-trips to '&lt;' not '<'
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

_COMMENT_RE = "(?s)<!--.*?-->"
_SCRIPT_RE = "(?is)<script[^>]*>.*?</script>"
_STYLE_RE = "(?is)<style[^>]*>.*?</style>"
_TAG_RE = "<[^>]+>"
_WS_RE = "[ \\t\\n\\r]+"


def html_to_text_expr(col: Column) -> Column:
    """Built-in tier: text extracted from an HTML string column (decode
    binary with ``F.decode(c, 'UTF-8')`` first). Subset contract as per
    module docstring; whitespace-collapsed and trimmed."""
    s = F.regexp_replace(col, _COMMENT_RE, " ")
    s = F.regexp_replace(s, _SCRIPT_RE, " ")
    s = F.regexp_replace(s, _STYLE_RE, " ")
    s = F.regexp_replace(s, _TAG_RE, " ")
    for ent, rep in _ENTITIES:
        s = F.regexp_replace(s, ent, rep)
    return F.trim(F.regexp_replace(s, _WS_RE, " "))


def html_to_text_sql(col: str) -> str:
    """DuckDB twin of :func:`html_to_text_expr` (same regexes, RE2
    accepts the (?s)/(?is) inline flags and lazy quantifiers)."""
    s = f"regexp_replace({col}, '(?s)<!--.*?-->', ' ', 'g')"
    s = f"regexp_replace({s}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    s = f"regexp_replace({s}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    s = f"regexp_replace({s}, '<[^>]+>', ' ', 'g')"
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        s = f"replace({s}, '{ent}', '{rep_sql}')"
    return f"trim(regexp_replace({s}, '[ \\t\\n\\r]+', ' ', 'g'))"


def href_count_expr(col: Column) -> Column:
    """Number of href attribute values (single- or double-quoted)."""
    return F.size(
        F.regexp_extract_all(col, F.lit("(?i)href=[\"'][^\"']*[\"']"), 0)
    ).cast("long")


def extract_text_py(html: str) -> str:
    """Production tier, single value: stdlib HTMLParser extraction with
    script/style suppression; data runs space-joined then collapsed —
    the same output contract as the built-in tier."""
    from html.parser import HTMLParser

    class _X(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self._skip = 0

        def handle_starttag(self, tag: str, attrs) -> None:
            if tag in ("script", "style"):
                self._skip += 1

        def handle_endtag(self, tag: str) -> None:
            if tag in ("script", "style") and self._skip:
                self._skip -= 1

        def handle_data(self, data: str) -> None:
            if not self._skip:
                self.parts.append(data)

    x = _X()
    x.feed(html or "")
    x.close()
    return " ".join(" ".join(x.parts).split())


def html_to_text_udf():
    """Arrow-batched pandas UDF wrapping :func:`extract_text_py`.
    DataType object (not a DDL string) so module import never needs an
    active session (repo-wide rule)."""

    @F.pandas_udf(StringType())
    def _extract(htmls: pd.Series) -> pd.Series:
        return htmls.map(lambda h: extract_text_py(h) if h is not None else None)

    return _extract
