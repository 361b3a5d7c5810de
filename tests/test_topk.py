"""grouped_topk: exact skew-safe per-group top-k (operators/topk.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.topk import grouped_topk, grouped_topk_naive


@pytest.fixture(scope="module")
def skewed(spark):
    # one mega group (6,000 rows — the hot-domain shape), a handful of
    # small groups including ones smaller than k, and heavy score ties so
    # the tiebreak ordering is actually exercised
    rows = [("hot", i, i % 97) for i in range(6000)]
    rows += [
        (f"g{j}", 100_000 + j * 100 + i, i % 3)
        for j in range(6)
        for i in range(j)  # g0 is empty, g1 has 1 row < k, ...
    ]
    return spark.createDataFrame(rows, "grp string, id long, score long")


def _order():
    return [F.col("score").desc(), F.col("id").asc()]


def _rows(df):
    return sorted(tuple(r) for r in df.select("grp", "id", "score", "rnk").collect())


def test_salted_equals_naive_on_skew(skewed):
    got = grouped_topk(skewed, ["grp"], _order(), 5, salt_src="id", buckets=8)
    want = grouped_topk_naive(skewed, ["grp"], _order(), 5)
    assert _rows(got) == _rows(want)
    # the hot group really did contribute exactly k winners
    assert sum(1 for g, *_ in _rows(got) if g == "hot") == 5


def test_k_larger_than_group_keeps_whole_group(skewed):
    small = skewed.where(F.col("grp") != "hot")
    got = grouped_topk(small, ["grp"], _order(), 50, salt_src="id", buckets=4)
    assert got.count() == small.count()
    assert _rows(got) == _rows(grouped_topk_naive(small, ["grp"], _order(), 50))


def test_ranks_deterministic_under_ties(skewed):
    a = _rows(grouped_topk(skewed, ["grp"], _order(), 3, salt_src="id", buckets=16))
    b = _rows(grouped_topk(skewed, ["grp"], _order(), 3, salt_src="id", buckets=3))
    assert a == b  # bucket count is a physical knob, not a semantic one


def test_plan_salts_the_first_window(skewed):
    q = grouped_topk(skewed, ["grp"], _order(), 3, salt_src="id", buckets=8)
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert len(windows) == 2
    # phase 1 (deepest = listed last) partitions by the salted key;
    # phase 2 (outer) must NOT — its input is capped at buckets*k per group
    assert "__tk_salt" in windows[-1]
    assert "__tk_salt" not in windows[0]
    # Catalyst's rank-limit pushdown kicks in for both phases: each window
    # gets a WindowGroupLimit that drops rows past rank k BEFORE the sort
    # buffer — the map-side partial top-k this operator wants
    assert plan.count("WindowGroupLimit") == 2


def test_validates_args(skewed):
    with pytest.raises(ValueError):
        grouped_topk(skewed, ["grp"], _order(), 0, salt_src="id")
    with pytest.raises(ValueError):
        grouped_topk(skewed, ["grp"], _order(), 3, salt_src="id", buckets=0)
