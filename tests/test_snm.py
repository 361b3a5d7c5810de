"""sorted_neighborhood_pairs / global_rank (operators/snm.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators.snm import global_rank, sorted_neighborhood_pairs

ROWS = [
    (1, "banana"),
    (2, "apple"),
    (3, "apple"),     # tie -> id breaks it
    (4, None),        # null key sorts first
    (5, "cherry"),
    (6, "applesauce"),
    (7, ""),          # empty string after null
    (8, "apricot"),
    (9, "zzz"),
    (10, "aardvark"),
]


def _ref_order():
    return [
        i for i, _ in sorted(ROWS, key=lambda r: (r[1] is not None, r[1] or "", r[0]))
    ]


def test_global_rank_matches_sort(spark):
    df = spark.createDataFrame(ROWS, "id long, k string")
    for n_buckets in (1, 3, 16):
        got = {
            r["id"]: r["rank"]
            for r in global_rank(df, "k", "id", n_buckets=n_buckets).collect()
        }
        want = {i: pos for pos, i in enumerate(_ref_order())}
        assert got == want, f"n_buckets={n_buckets}"


def test_pairs_match_brute_force(spark):
    df = spark.createDataFrame(ROWS, "id long, k string")
    w = 3
    got = {
        (r["id1"], r["id2"], r["gap"])
        for r in sorted_neighborhood_pairs(df, "id", F.col("k"), window=w).collect()
    }
    order = _ref_order()
    want = {
        (order[i], order[i + g], g)
        for i in range(len(order))
        for g in range(1, w)
        if i + g < len(order)
    }
    assert got == want


def test_candidate_volume_is_skew_independent(spark):
    # 200 records ALL sharing one key: hash blocking would emit C(200,2)
    # = 19,900 pairs; the sorted window emits 200*(w-1) - C(w-1+1,2)
    df = spark.createDataFrame([(i, "same") for i in range(200)], "id long, k string")
    n = sorted_neighborhood_pairs(df, "id", F.col("k"), window=5).count()
    assert n == 200 * 4 - 10


def test_global_rank_unicode_keys(spark):
    # codepoints >= 255 clamp into shared buckets but stay correctly
    # ordered by the in-bucket sort
    rows = [(1, "zebra"), (2, "éclair"), (3, "中文"),
            (4, "apple"), (5, "À"), (6, "￿"), (7, "zz")]
    df = spark.createDataFrame(rows, "id long, k string")
    for n_buckets in (1, 4):
        got = {
            r["id"]: r["rank"]
            for r in global_rank(df, "k", "id", n_buckets=n_buckets).collect()
        }
        want = {i: pos for pos, i in enumerate(
            i for i, _ in sorted(rows, key=lambda r: (r[1], r[0])))}
        assert got == want, f"n_buckets={n_buckets}"


def test_global_rank_adversarial_unicode_inversion(spark):
    # 'Āb' < 'āa' by codepoint, but per-position clamping gives
    # proxy('Āb') > proxy('āa') — the truncating proxy must not invert
    rows = [(1, "Āb"), (2, "āa"), (3, "zz"), (4, "aa"),
            (5, "Āa"), (6, "zā")]
    df = spark.createDataFrame(rows, "id long, k string")
    want = {i: pos for pos, i in enumerate(
        i for i, _ in sorted(rows, key=lambda r: (r[1], r[0])))}
    for n_buckets in (1, 2, 4, 16):
        got = {
            r["id"]: r["rank"]
            for r in global_rank(df, "k", "id", n_buckets=n_buckets).collect()
        }
        assert got == want, f"n_buckets={n_buckets}"
