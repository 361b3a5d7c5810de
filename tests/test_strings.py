"""String-kernel tests: parity with DuckDB built-ins + hashing properties."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from dedupe_spark.functions import strings as S

PAIRS = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("", ""),
    ("", "abc"),
    ("abc", ""),
    ("identical", "identical"),
    ("a", "b"),
    ("kitten", "sitting"),
    ("flaw", "lawn"),
    ("gumbo", "gambol"),
    ("acme corp", "acme corporation"),
    ("the quick brown fox", "quick the brown fox"),
    ("site0.example.com", "site1.example.com"),
]


def test_jaro_winkler_matches_duckdb():
    duck = duckdb.connect()
    for a, b in PAIRS:
        want = duck.sql(
            "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert S.jaro_winkler(a, b) == pytest.approx(want, abs=1e-12), (a, b)


def test_levenshtein_matches_duckdb():
    duck = duckdb.connect()
    for a, b in PAIRS:
        want = duck.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        assert S.levenshtein(a, b) == want, (a, b)


def test_levenshtein_sim_bounds():
    for a, b in PAIRS:
        v = S.levenshtein_sim(a, b)
        assert 0.0 <= v <= 1.0
    assert S.levenshtein_sim("x", "x") == 1.0
    assert S.levenshtein_sim("", "") == 1.0


def test_token_cosine():
    assert S.token_cosine("a b c", "a b c") == pytest.approx(1.0)
    assert S.token_cosine("a b", "c d") == 0.0
    assert S.token_cosine("", "a") == 0.0
    # orderless
    assert S.token_cosine("a b c", "c b a") == pytest.approx(1.0)
    assert 0 < S.token_cosine("a b c d", "a b x y") < 1


def test_ngram_jaccard():
    assert S.ngram_jaccard("abcdef", "abcdef") == 1.0
    assert S.ngram_jaccard("", "") == 1.0
    assert S.ngram_jaccard("abc", "xyz") == 0.0
    assert 0 < S.ngram_jaccard("abcdef", "abcxef") < 1


def test_batch_wrappers_match_scalars():
    s1 = pd.Series([a for a, _ in PAIRS])
    s2 = pd.Series([b for _, b in PAIRS])
    np.testing.assert_allclose(
        S.jw_batch(s1, s2), [S.jaro_winkler(a, b) for a, b in PAIRS]
    )
    np.testing.assert_allclose(
        S.lev_sim_batch(s1, s2), [S.levenshtein_sim(a, b) for a, b in PAIRS]
    )
    np.testing.assert_allclose(
        S.token_cosine_batch(s1, s2), [S.token_cosine(a, b) for a, b in PAIRS]
    )


def test_minhash_estimates_jaccard():
    """MinHash signature agreement ≈ Jaccard of the shingle sets."""
    a, b = S.minhash_params(num_perm=128, seed=7)
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "the quick brown fox leaps over the lazy dog again and again"
    s1, s2 = set(S.char_shingles(t1)), set(S.char_shingles(t2))
    true_j = len(s1 & s2) / len(s1 | s2)
    sig1 = S.minhash_signature(S.char_shingles(t1), a, b)
    sig2 = S.minhash_signature(S.char_shingles(t2), a, b)
    est = float((sig1 == sig2).mean())
    assert abs(est - true_j) < 0.15


def test_minhash_deterministic():
    a, b = S.minhash_params(32)
    a2, b2 = S.minhash_params(32)
    np.testing.assert_array_equal(a, a2)
    sig = S.minhash_signature(S.char_shingles("hello world"), a, b)
    sig2 = S.minhash_signature(S.char_shingles("hello world"), a2, b2)
    np.testing.assert_array_equal(sig, sig2)


def test_band_keys_identical_texts_collide():
    a, b = S.minhash_params(32)
    sig = S.minhash_signature(S.char_shingles("identical text"), a, b)
    k1 = S.band_keys(sig, bands=8, rows=4)
    k2 = S.band_keys(sig, bands=8, rows=4)
    assert k1 == k2
    assert len(k1) == 8
    assert len(set(k1)) == 8  # band index folded in -> distinct keys


def test_simhash_near_duplicates_close():
    t1 = "the quick brown fox jumps over the lazy dog".split()
    t2 = "the quick brown fox jumps over the lazy cat".split()
    t3 = "completely different words in this unrelated sentence".split()
    h1, h2, h3 = S.simhash64(t1), S.simhash64(t2), S.simhash64(t3)
    assert S.hamming64(h1, h1) == 0
    assert S.hamming64(h1, h2) < S.hamming64(h1, h3)
    assert S.simhash64([]) == 0
