"""PII detection + redaction kernels (email / IPv4 / phone).

Web-scraped training corpora are scrubbed of obvious PII before
training; these are the standard regex-class detectors (the C4 /
BigScience-style pass), built entirely from JVM-side regexp functions —
no Python in the row path, whole-stage-codegen throughout, so the scrub
is a pure map stage that scales linearly with input bytes and never
shuffles.

The patterns are deliberately RE2-safe (no backreferences, no
lookaround) so the SAME pattern string runs identically under Spark's
Java regex and DuckDB/RE2 — the driver oracle relies on this.

Redaction replaces matches in a FIXED order (email, then IPv4, then
phone) with typed placeholder tokens; counts are computed on the
original text so they are independent of that order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_counts(col: str | Column) -> Column:
    """struct(n_emails, n_ipv4, n_phones) — match counts on raw text."""
    c = F.col(col) if isinstance(col, str) else col

    def _n(pat: str) -> Column:
        # cast long: DuckDB len() is BIGINT, keep the twin schemas aligned
        return F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).cast(
            "long"
        )

    return F.struct(
        _n(EMAIL_RE).alias("n_emails"),
        _n(IPV4_RE).alias("n_ipv4"),
        _n(PHONE_RE).alias("n_phones"),
    )


def redact_pii(col: str | Column) -> Column:
    """Text with every email, IPv4 and phone replaced by typed tokens.

    Email runs first: its character class can span dots and digits, so
    scrubbing it before the narrower patterns keeps the result
    independent of how an address happens to embed digit runs.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN)
    c = F.regexp_replace(c, IPV4_RE, IPV4_TOKEN)
    return F.regexp_replace(c, PHONE_RE, PHONE_TOKEN)


def scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, n_emails, n_ipv4, n_phones, redacted) per document."""
    counts = pii_counts(text_col)
    return docs.select(
        id_col,
        counts["n_emails"].alias("n_emails"),
        counts["n_ipv4"].alias("n_ipv4"),
        counts["n_phones"].alias("n_phones"),
        redact_pii(text_col).alias("redacted"),
    )
