"""point_in_interval_join (operators/rangejoin.py): brute force + plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators.rangejoin import point_in_interval_join

# points: (pid, p_us)
POINTS = [(1, 0), (2, 99), (3, 100), (4, 150), (5, 250), (6, 299),
          (7, 300), (8, 1000), (9, 10**9), (10, None)]
# intervals: (iid, start_us, end_us) — spans 1 bin, 2 bins, many bins,
# zero-length (dropped), exact-boundary ends, a bin-aligned interval
INTERVALS = [
    (100, 0, 100),        # [0,100): pids 1,2 — pid 3 at 100 excluded
    (101, 100, 300),      # [100,300): pids 3,4,5,6 — pid 7 at 300 excluded
    (102, 150, 150),      # zero-length: dropped
    (103, 250, 1001),     # spans several bins: pids 5,6,7,8
    (104, 10**9, 10**9 + 1),  # 1-us interval far away: pid 9
    (105, None, 50),      # null bound: dropped
]


def _brute():
    out = set()
    for iid, s, e in INTERVALS:
        if s is None or e is None or e <= s:
            continue
        for pid, p in POINTS:
            if p is not None and s <= p < e:
                out.add((iid, pid))
    return out


def _join(spark, bin_width):
    pts = spark.createDataFrame(POINTS, "pid long, p_us long")
    ivs = spark.createDataFrame(INTERVALS, "iid long, start_us long, end_us long")
    return point_in_interval_join(pts, ivs, bin_width)


def test_matches_brute_force_across_bin_widths(spark):
    for bin_width in (1, 7, 100, 128, 10**6):
        got = {(r["iid"], r["pid"]) for r in _join(spark, bin_width).collect()}
        assert got == _brute(), f"bin_width={bin_width}"


def test_pairs_unique_when_bin_equals_width(spark):
    # every true pair must appear exactly once (no dedup pass exists)
    rows = _join(spark, 100).collect()
    pairs = [(r["iid"], r["pid"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_equi_join_plan(spark):
    plan = _join(spark, 100)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_columns_preserved(spark):
    out = _join(spark, 100)
    assert set(out.columns) == {"pid", "p_us", "iid", "start_us", "end_us"}
