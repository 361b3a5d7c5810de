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


# ------------------------------------------------- tf adjustment + waterfall


# (id1, id2, is_match, g_a, g_v, v) — g_v agrees on a shared value v
TF_PAIRS = [
    (1, 2, 1, 1, 1, "rare"),
    (1, 3, 1, 1, 1, "common"),
    (2, 3, 1, 0, 0, None),
    (4, 5, 0, 1, 1, "common"),
    (4, 6, 0, 0, 0, None),
    (5, 6, 0, 0, 1, "common"),
]
# record-level value population: 'common' ×8, 'rare' ×1, one NULL
TF_VALUES = [("common",)] * 8 + [("rare",)] + [(None,)]


def _ref_tf():
    n_m = sum(p[2] for p in TF_PAIRS)
    n_u = len(TF_PAIRS) - n_m
    micro = lambda x: int(round(math.log(x) * 1e6))
    w = {}
    for k, gi in (("g_a", 3), ("g_v", 4)):
        am = sum(p[gi] for p in TF_PAIRS if p[2] == 1)
        au = sum(p[gi] for p in TF_PAIRS if p[2] == 0)
        m = (am + 0.5) / (n_m + 1)
        u = (au + 0.5) / (n_u + 1)
        w[k] = (micro(m) - micro(u), micro(1 - m) - micro(1 - u))
    m_v = (sum(p[4] for p in TF_PAIRS if p[2] == 1) + 0.5) / (n_m + 1)
    wm_tf = micro(m_v)
    n_vals = sum(1 for (v,) in TF_VALUES if v is not None)
    cnt = {}
    for (v,) in TF_VALUES:
        if v is not None:
            cnt[v] = cnt.get(v, 0) + 1
    out = {}
    for i1, i2, lbl, ga, gv, v in TF_PAIRS:
        generic = w["g_a"][0 if ga else 1] + w["g_v"][0 if gv else 1]
        if gv:
            adj = w["g_a"][0 if ga else 1] + (wm_tf - micro(cnt[v] / n_vals))
        else:
            adj = generic
        out[(i1, i2)] = (generic, adj)
    return out


def _tf_frames(spark):
    pairs = spark.createDataFrame(
        TF_PAIRS,
        "id1 long, id2 long, is_match int, g_a int, g_v int, v_tok string",
    )
    values = spark.createDataFrame(TF_VALUES, "v string")
    return pairs, values


def test_tf_adjusted_python_rederivation(spark):
    from dedupe_spark.operators.fellegi import tf_adjusted_scores

    pairs, values = _tf_frames(spark)
    rows = tf_adjusted_scores(
        pairs, values, "is_match", ("g_a", "g_v"), "g_v", "v_tok"
    ).collect()
    ref = _ref_tf()
    for r in rows:
        g, a = ref[(r["id1"], r["id2"])]
        assert r["fs_micros"] == g
        assert r["fs_tf_micros"] == a
        assert r["tf_adj_micros"] == a - g


def test_tf_rare_value_beats_common(spark):
    """The point of the adjustment: same gammas, rarer shared value →
    strictly higher adjusted score; generic scores identical."""
    from dedupe_spark.operators.fellegi import tf_adjusted_scores

    pairs, values = _tf_frames(spark)
    by = {
        (r["id1"], r["id2"]): r
        for r in tf_adjusted_scores(
            pairs, values, "is_match", ("g_a", "g_v"), "g_v", "v_tok"
        ).collect()
    }
    rare, common = by[(1, 2)], by[(1, 3)]
    assert rare["fs_micros"] == common["fs_micros"]
    assert rare["fs_tf_micros"] > common["fs_tf_micros"]
    assert rare["tf_adj_micros"] > 0  # rarer than chance-agreement baseline


def test_tf_disagreement_unadjusted(spark):
    from dedupe_spark.operators.fellegi import tf_adjusted_scores

    pairs, values = _tf_frames(spark)
    rows = tf_adjusted_scores(
        pairs, values, "is_match", ("g_a", "g_v"), "g_v", "v_tok"
    ).collect()
    for r in rows:
        if r["v_tok"] is None:
            assert r["tf_adj_micros"] == 0
            assert r["fs_tf_micros"] == r["fs_micros"]


def test_waterfall_steps_and_final_sum(spark):
    from dedupe_spark.operators.fellegi import (
        fellegi_sunter_scores,
        fs_waterfall,
    )

    df = spark.createDataFrame(
        PAIRS, "id1 long, id2 long, is_match int, g_a int, g_b int"
    )
    wf = fs_waterfall(df, "is_match", ("g_a", "g_b")).collect()
    assert len(wf) == 2 * len(PAIRS)
    fs = {
        (r["id1"], r["id2"]): r["fs_micros"]
        for r in fellegi_sunter_scores(df, "is_match", ("g_a", "g_b")).collect()
    }
    by_pair = {}
    for r in wf:
        by_pair.setdefault((r["id1"], r["id2"]), []).append(r)
    for key, steps in by_pair.items():
        steps.sort(key=lambda r: r["step"])
        assert [r["field"] for r in steps] == ["g_a", "g_b"]
        # running cumulative is the prefix sum of the per-field weights
        run = 0
        for r in steps:
            run += r["w_micros"]
            assert r["cum_micros"] == run
        # final step equals the scorer's total — the waterfall IS the score
        assert steps[-1]["cum_micros"] == fs[key]


def test_waterfall_no_extra_shuffle(spark):
    """The prefix sum happens inside the array before the explode: the
    waterfall plan must not add an Exchange beyond the input's own."""
    from dedupe_spark.operators.fellegi import fs_waterfall

    df = spark.createDataFrame(
        PAIRS, "id1 long, id2 long, is_match int, g_a int, g_b int"
    )
    plan = fs_waterfall(df, "is_match", ("g_a", "g_b"))._jdf.queryExecution().executedPlan().toString()
    # the 1-row params aggregate contributes its scalar exchange pair;
    # there must be no pair-keyed Exchange (no window over (id1, id2))
    assert "Window" not in plan
