"""URL canonicalization for web-page dedup (the input_hint table is
url-keyed: pages(url, warc_ts, html, text, lang)).

Crawls see the same page under many raw spellings — scheme/host case,
default ports, fragments, tracking params, param order. Canonicalizing
before exact/near dedup collapses those families; at 100 TB this is a
pure per-row projection (no shuffle, whole-stage codegen), after which
dedup-by-canonical-url is an ordinary hash groupBy on a far less skewed
key than raw url.

Rules (conservative — never merges semantically distinct resources):
1. strip the fragment (``#...`` — client-side only);
2. lowercase the scheme and the host (RFC 3986 §6.2.2.1);
3. drop the default port (``:80`` for http, ``:443`` for https);
4. empty path -> ``/``;
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``) and sort
   the remaining params (RFC-agnostic but standard crawler practice —
   param order is almost never semantic);
6. non-absolute inputs (no ``://``) pass through trimmed + lowercased.

Both engines implement the identical CASE chain: :func:`canonical_url`
(Spark built-ins only) and :func:`canonical_url_sql` (DuckDB) — the
driver's oracle checks them value-equal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid)(=.*)?$"


def canonical_url(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(F.trim(c), r"#.*", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qs = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        scheme == "", F.lower(F.trim(c))
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, qs))


def canonical_url_sql(expr: str) -> str:
    """The DuckDB twin of :func:`canonical_url` — same CASE chain."""
    u = f"regexp_replace(trim({expr}), '#.*', '')"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    rest = f"regexp_replace({u}, '{_SCHEME_RE}', '')"
    hostport = f"lower(regexp_extract({rest}, '^([^/?]+)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    pathq = f"substr({rest}, len({hostport}) + 1)"
    path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    query = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p != '' AND NOT regexp_matches(p, '{_TRACKING_RE}')))"
    )
    qs = (
        f"CASE WHEN len({params}) > 0 "
        f"THEN '?' || array_to_string({params}, '&') ELSE '' END"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN lower(trim({expr})) "
        f"ELSE {scheme} || '://' || {host} || {path} || {qs} END"
    )


# host / domain extraction for domain-level filtering (operators/domains.py).
# "domain" here is the host with a leading "www." stripped — a documented
# simplification of eTLD+1 (a real public-suffix split needs the PSL, an
# external artifact this build deliberately avoids; subdomain-level grouping
# is strictly finer, so a domain-level verdict still covers every page the
# eTLD+1 verdict would, just split across subdomains).
_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def url_domain(col: Column | str) -> Column:
    """Lowercased host of an absolute URL, minus any leading ``www.``;
    empty string for non-absolute inputs. Pure projection, codegen-able."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.regexp_extract(F.lower(F.trim(c)), _HOST_RE, 1)
    return F.regexp_replace(host, r"^www\.", "")


def url_domain_sql(expr: str) -> str:
    """DuckDB twin of :func:`url_domain` (same regexes, RE2-safe)."""
    host = f"regexp_extract(lower(trim({expr})), '{_HOST_RE}', 1)"
    return f"regexp_replace({host}, '^www\\.', '')"
