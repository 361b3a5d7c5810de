"""grouped_quantiles_exact vs a sorted-list reference (operators/quantiles.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dedupe_spark.operators.quantiles import grouped_quantiles_exact

PS = (0.25, 0.5, 0.75, 0.95, 1.0)
NAMES = ("p25", "p50", "p75", "p95", "p100")


def ref_quantile(vals, p):
    s = sorted(vals)
    return s[math.ceil(p * len(s)) - 1]


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.RandomState(11)
    rows = [("g%d" % (i % 3), int(v)) for i, v in enumerate(rng.randint(0, 50, 3000))]
    rows += [("lone", 42)]  # single-element group
    rows += [("g0", None)]  # null excluded
    return (
        rows,
        spark.createDataFrame(rows, "grp string, v long"),
    )


def test_matches_sorted_reference(data):
    rows, df = data
    got = {
        r["grp"]: [r[n] for n in NAMES]
        for r in grouped_quantiles_exact(df, ["grp"], "v", PS, NAMES).collect()
    }
    for g in ("g0", "g1", "g2", "lone"):
        vals = [v for (gg, v) in rows if gg == g and v is not None]
        assert got[g] == [ref_quantile(vals, p) for p in PS], g


def test_p100_is_max_and_lone_group(data):
    rows, df = data
    out = {r["grp"]: r for r in grouped_quantiles_exact(df, ["grp"], "v", PS, NAMES).collect()}
    assert out["lone"]["p25"] == out["lone"]["p100"] == 42
    vals = [v for (g, v) in rows if g == "g1"]
    assert out["g1"]["p100"] == max(vals)


def test_validates_args(data):
    _, df = data
    with pytest.raises(ValueError):
        grouped_quantiles_exact(df, ["grp"], "v", (0.5,), ("a", "b"))
    with pytest.raises(ValueError):
        grouped_quantiles_exact(df, ["grp"], "v", (0.0,), ("a",))


def test_shuffle_carries_distinct_values_not_rows(data):
    _, df = data
    # the count relation the windows run over: ≤ groups × |domain| rows
    from pyspark.sql import functions as F

    vc = df.where(F.col("v").isNotNull()).groupBy("grp", "v").count()
    assert vc.count() <= 4 * 51


def test_rank_fp_boundary_exact(spark):
    """ceil(0.55*100) must be 55, not 56 (0.55*100 is an ulp above 55
    in doubles)."""
    from dedupe_spark.operators.quantiles import grouped_quantiles_exact

    df = spark.createDataFrame(
        [("g", i) for i in range(1, 101)], "g string, v long"
    )
    (row,) = grouped_quantiles_exact(
        df, ["g"], "v", [0.55, 0.07], ["p55", "p07"]
    ).collect()
    assert row["p55"] == 55
    assert row["p07"] == 7
