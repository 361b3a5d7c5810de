"""Affine-gap + TF-IDF comparator tests (dedupe parity comparators)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dedupe_spark.functions import strings as S
from dedupe_spark.functions.features import FieldSpec, compute_features, feature_names
from dedupe_spark.functions.text import compute_idf


def test_affine_gap_scalar_values():
    # identical: match cost 1/char, normalized by 2*len -> 0.5
    assert S.normalized_affine_gap("hello", "hello") == pytest.approx(0.5)
    # all-mismatch same length: 11/2 = 5.5
    assert S.normalized_affine_gap("aaaa", "bbbb") == pytest.approx(5.5)
    # empty vs empty
    assert S.normalized_affine_gap("", "") == 0.0
    # one empty: open + space*len over len
    assert S.normalized_affine_gap("", "ab") == pytest.approx((10 + 7 * 2) / 2)


def test_affine_gap_prefers_gap_over_mismatch_run():
    """'abcdef' vs 'abef': one gap of 2 beats two mismatches + shifts."""
    d_gap = S.affine_gap_distance("abcdef", "abef")
    # 4 matches (a,b,e,f) + gap open + 2 spaces = 4*1 + 10 + 14 = 28
    assert d_gap == pytest.approx(28.0)


def test_affine_gap_ranks_similarity():
    base = "international business machines"
    near = "international business machine"
    far = "zzz qqq xxx yyy www vvv uuu ttt"
    assert S.normalized_affine_gap(base, near) < S.normalized_affine_gap(
        base, far
    )


def test_affine_gap_batch_matches_scalar_fuzz():
    import random

    rng = random.Random(17)
    pairs = [
        (
            "".join(rng.choice("abc de") for _ in range(rng.randint(0, 12))),
            "".join(rng.choice("abc de") for _ in range(rng.randint(0, 12))),
        )
        for _ in range(500)
    ]
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = S.affine_gap_batch_np(a, b)
    want = [S.normalized_affine_gap(x, y) for x, y in pairs]
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_tfidf_cosine_weights_rare_tokens():
    idf = {"the": 0.1, "acme": 3.0, "corp": 2.0}
    # shared rare token dominates shared stopword
    rare = S.tfidf_cosine("acme x", "acme y", idf, 3.0)
    stop = S.tfidf_cosine("the x", "the y", idf, 3.0)
    assert rare > stop
    assert S.tfidf_cosine("a b", "a b", idf, 3.0) == pytest.approx(1.0)
    assert S.tfidf_cosine("", "a", idf, 3.0) == 0.0


def test_tfidf_batch_matches_scalar():
    idf = {"alpha": 2.0, "beta": 1.0, "the": 0.05}
    pairs = [
        ("alpha beta", "alpha gamma"),
        ("the alpha", "the beta"),
        ("", "x"),
        ("same same", "same same"),
    ]
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = S.tfidf_cosine_batch_np(a, b, idf, 1.5)
    want = [S.tfidf_cosine(x, y, idf, 1.5) for x, y in pairs]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_compute_idf(spark):
    df = spark.createDataFrame(
        [("the cat",), ("the dog",), ("the cow",), ("rare token",)],
        "text string",
    )
    idf, default = compute_idf(df, "text", min_df=1)
    assert idf["the"] < idf["cat"]  # common token -> lower weight
    assert default > 0


def test_feature_spec_affine_and_idf():
    fields = [
        FieldSpec("name", "Affine"),
        FieldSpec("body", "Text", idf={"x": 2.0}, default_idf=1.0),
    ]
    assert feature_names(fields) == [
        "name_ag", "name_missing", "body_cos", "body_missing",
    ]
    X = compute_features(
        {"name": pd.Series(["acme", "N/A"]), "body": pd.Series(["x y", "x y"])},
        {"name": pd.Series(["acme", "acme"]), "body": pd.Series(["x z", "x y"])},
        fields,
    )
    assert X.shape == (2, 4)
    assert X[0, 0] == pytest.approx(0.5)  # identical affine distance
    assert X[1, 1] == 1.0                 # missing indicator
    assert 0 < X[0, 2] < 1                # weighted cosine of partial overlap
    assert X[1, 2] == pytest.approx(1.0)
