"""fellegi_sunter_scores (operators/fellegi.py) vs a Python re-derivation."""

from __future__ import annotations

import math

import pytest

from dedupe_spark.operators.fellegi import fellegi_sunter_scores

# (id1, id2, is_match, g_a, g_b)
PAIRS = [
    (1, 2, 1, 1, 1),
    (1, 3, 1, 1, 0),
    (2, 3, 1, 0, 1),
    (4, 5, 0, 1, 0),
    (4, 6, 0, 0, 0),
    (5, 6, 0, 0, 0),
    (7, 8, 0, 0, 1),
    (7, 9, 0, 0, 0),
]


def _ref_scores():
    n_m = sum(p[2] for p in PAIRS)
    n_u = len(PAIRS) - n_m
    out = {}
    w = {}
    for k, gi in (("g_a", 3), ("g_b", 4)):
        am = sum(p[gi] for p in PAIRS if p[2] == 1)
        au = sum(p[gi] for p in PAIRS if p[2] == 0)
        m = (am + 0.5) / (n_m + 1)
        u = (au + 0.5) / (n_u + 1)
        micro = lambda x: int(round(math.log(x) * 1e6))
        w[k] = (micro(m) - micro(u), micro(1 - m) - micro(1 - u))
    for i1, i2, lbl, ga, gb in PAIRS:
        s = w["g_a"][0 if ga else 1] + w["g_b"][0 if gb else 1]
        out[(i1, i2)] = s
    return out


def test_matches_python_rederivation(spark):
    df = spark.createDataFrame(
        PAIRS, "id1 long, id2 long, is_match int, g_a int, g_b int"
    )
    got = {
        (r["id1"], r["id2"]): r["fs_micros"]
        for r in fellegi_sunter_scores(df, "is_match", ("g_a", "g_b")).collect()
    }
    assert got == _ref_scores()


def test_agreement_scores_higher(spark):
    df = spark.createDataFrame(
        PAIRS, "id1 long, id2 long, is_match int, g_a int, g_b int"
    )
    rows = fellegi_sunter_scores(df, "is_match", ("g_a", "g_b")).collect()
    by_pair = {(r["id1"], r["id2"]): r["fs_micros"] for r in rows}
    # full agreement must outrank full disagreement
    assert by_pair[(1, 2)] > by_pair[(4, 6)]


def test_input_columns_preserved(spark):
    df = spark.createDataFrame(
        PAIRS, "id1 long, id2 long, is_match int, g_a int, g_b int"
    )
    out = fellegi_sunter_scores(df, "is_match", ("g_a", "g_b"))
    assert out.columns == ["id1", "id2", "is_match", "g_a", "g_b", "fs_micros"]
    assert out.count() == len(PAIRS)
