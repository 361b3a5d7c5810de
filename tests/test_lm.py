"""Char-trigram LM scorer (operators/lm.py) against an independent
pure-python reference: dict-counted trigrams, math.log, the same
micro-nat quantization — no Spark expressions shared."""

from __future__ import annotations

import math
import re

import pytest

from dedupe_spark.operators.lm import (
    SMOOTH_ADD,
    SMOOTH_VOCAB,
    score_char_trigram_nll,
    train_char_trigram_lm,
)


def _norm(s: str) -> str:
    return re.sub(r"[ \t\n\r]+", " ", (s or "").lower()).strip()


def _ref_model(train_texts):
    c3: dict[str, int] = {}
    for t in train_texts:
        s = _norm(t)
        for i in range(len(s) - 2):
            c3[s[i : i + 3]] = c3.get(s[i : i + 3], 0) + 1
    c2: dict[str, int] = {}
    for tri, n in c3.items():
        c2[tri[:2]] = c2.get(tri[:2], 0) + n
    return c3, c2


def _ref_score(text, c3, c2):
    s = _norm(text)
    n = len(s) - 2
    if n <= 0:
        return 0, None, None
    sum_lp = 0
    oov = 0
    for i in range(n):
        tri = s[i : i + 3]
        k3 = c3.get(tri, 0)
        k2 = c2.get(tri[:2], 0)
        if k3 == 0:
            oov += 1
        sum_lp += int(
            _half_away(math.log((k3 + SMOOTH_ADD) / (k2 + SMOOTH_VOCAB)) * 1e6)
        )
    return n, round(oov / n, 6), round(-sum_lp / (1e6 * n), 6)


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the hat"),
    (3, "THE  CAT\tsat on\nthe mat"),  # normalizes to doc 1's text
    (4, "zzz qqq xxyyzz completely different content here"),
    (5, "ab"),  # < 3 normalized chars: n_tri = 0, NULL ratios
    (6, ""),
    (7, "the quick brown fox jumps over the lazy dog"),
]
TRAIN_IDS = {1, 2, 7}


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    lm3, lm2 = train_char_trigram_lm(
        df.where(df.doc_id.isin(*TRAIN_IDS))
    )
    out = score_char_trigram_nll(df, lm3, lm2)
    return {r["doc_id"]: r for r in out.collect()}


def test_matches_independent_reference(scored):
    c3, c2 = _ref_model([t for i, t in DOCS if i in TRAIN_IDS])
    assert len(scored) == len(DOCS)
    for doc_id, text in DOCS:
        n, oov, nll = _ref_score(text, c3, c2)
        row = scored[doc_id]
        assert row["n_tri"] == n, doc_id
        if n == 0:
            assert row["oov_frac"] is None and row["avg_nll"] is None
        else:
            assert row["oov_frac"] == pytest.approx(oov), doc_id
            assert row["avg_nll"] == pytest.approx(nll, abs=2e-6), doc_id


def test_normalization_collapses_case_and_whitespace(scored):
    # doc 3 normalizes to exactly doc 1's text -> identical scores
    assert scored[3]["avg_nll"] == scored[1]["avg_nll"]
    assert scored[3]["n_tri"] == scored[1]["n_tri"]


def test_in_distribution_scores_below_off_distribution(scored):
    # training member << never-seen-gibberish doc
    assert scored[1]["oov_frac"] == 0.0
    assert scored[4]["oov_frac"] > 0.5
    assert scored[1]["avg_nll"] < scored[4]["avg_nll"]


def test_short_docs_carry_no_evidence(scored):
    for doc_id in (5, 6):
        assert scored[doc_id]["n_tri"] == 0
        assert scored[doc_id]["oov_frac"] is None
        assert scored[doc_id]["avg_nll"] is None
