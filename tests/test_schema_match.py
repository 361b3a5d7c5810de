"""Instance-based schema matching (queries.q_schema_match)."""

from __future__ import annotations

from dedupe_spark.queries import _SM_K, _SM_TRUE_MAP, QUERIES

SF = "/root/testdata/sf0.001"


def test_schema_match_recovers_the_permutation(spark):
    df = QUERIES["schema_match"](spark, SF).toPandas()
    assert len(df) == 25  # full 5x5 grid
    best = df[df["is_best"]].set_index("col_a")["col_b"].to_dict()
    truth = {v: k for k, v in _SM_TRUE_MAP.items()}
    assert best == truth
    # the true cells are perfect resemblance (same data both sides)
    for _, r in df.iterrows():
        assert 0 <= r["est_num"] <= r["k_used"] <= _SM_K
        if truth[r["col_a"]] == r["col_b"]:
            assert r["est_num"] == r["k_used"]


def test_schema_match_off_cells_are_weak(spark):
    df = QUERIES["schema_match"](spark, SF).toPandas()
    truth = {v: k for k, v in _SM_TRUE_MAP.items()}
    off = df[
        df.apply(lambda r: truth[r["col_a"]] != r["col_b"], axis=1)
    ]
    # disjoint-domain columns share essentially no values: every
    # off-diagonal estimate sits well below the perfect diagonal
    assert (off["est_num"] < off["k_used"]).all()
    assert (off["est_num"] <= off["k_used"] * 0.5).all()
