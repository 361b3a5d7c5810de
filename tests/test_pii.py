"""PII detection/redaction kernels (functions/pii.py)."""

from __future__ import annotations

import re

from dedupe_spark.functions import pii as P


def _scrub_one(spark, text):
    return P.scrub(spark.createDataFrame([("d1", text)], ["doc_id", "text"])).head()


def test_counts_and_redaction_all_three_classes(spark):
    r = _scrub_one(
        spark,
        "mail a.user+tag@sub.example.org or admin@example.com, "
        "host 192.168.0.1, call 415-555-0123 now",
    )
    assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == (2, 1, 1)
    assert r["redacted"] == (
        "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE> now"
    )


def test_clean_text_untouched(spark):
    r = _scrub_one(spark, "no secrets here just words and the number 42")
    assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == (0, 0, 0)
    assert r["redacted"] == "no secrets here just words and the number 42"


def test_email_scrubbed_before_narrower_patterns(spark):
    # the digits inside an address must not leak as a phone/IP match
    r = _scrub_one(spark, "reach 555-123-4567@ex.co please")
    assert r["n_emails"] == 1
    assert r["redacted"] == "reach <EMAIL> please"


def test_phone_requires_word_boundaries(spark):
    r = _scrub_one(spark, "id X555-123-45678 is not a phone")
    assert r["n_phones"] == 0


def test_patterns_are_re2_safe_and_python_agrees(spark):
    # the same pattern strings must behave identically under Python's re
    # (a superset of both Java regex and RE2 for this feature set)
    text = "a@b.io 10.0.0.7 555-867-5309"
    r = _scrub_one(spark, text)
    assert r["n_emails"] == len(re.findall(P.EMAIL_RE, text)) == 1
    assert r["n_ipv4"] == len(re.findall(P.IPV4_RE, text)) == 1
    assert r["n_phones"] == len(re.findall(P.PHONE_RE, text)) == 1
