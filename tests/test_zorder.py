"""z_value / zorder_tile_stats (operators/zorder.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators.zorder import BITS, z_value, zorder_tile_stats


def _ref_z(a: int, b: int, bits: int = BITS) -> int:
    z = 0
    for j in range(bits):
        z |= ((a >> j) & 1) << (2 * j)
        z |= ((b >> j) & 1) << (2 * j + 1)
    return z


def test_z_value_matches_reference(spark):
    rows = [(a, b) for a in (0, 1, 2, 3, 255, 4095, 65535) for b in (0, 1, 7, 511, 65535)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", z_value(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _ref_z(a, b)


def test_z_is_a_bijection_on_the_grid(spark):
    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")
    zs = [r["z"] for r in df.select(z_value(F.col("a"), F.col("b")).alias("z")).collect()]
    assert len(set(zs)) == len(rows)
    assert min(zs) == 0 and max(zs) == 1023  # 32x32 grid fills [0, 2^10)


def test_tile_extent_bounded(spark):
    # a z-tile of 2^s consecutive z-values spans <= 2^ceil(s/2) per dim
    rows = [(a, b) for a in range(128) for b in range(128)]
    df = spark.createDataFrame(rows, "a long, b long")
    shift = 8
    stats = zorder_tile_stats(df, "a", "b", shift, (0, 0, 0, 0)).collect()
    for r in stats:
        assert r["max_a"] - r["min_a"] <= 2 ** ((shift + 1) // 2)
        assert r["max_b"] - r["min_b"] <= 2 ** ((shift + 1) // 2)


def test_zorder_prunes_what_single_column_sort_cannot(spark):
    # uniform 64x64 grid, box = 1/8 of each dim -> 1/64 of the data
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    box = (0, 7, 0, 7)
    z = zorder_tile_stats(df, "a", "b", 6, box).collect()  # 64 tiles of 64
    z_kept = sum(r["n_rows"] for r in z if r["skip"] == 0)
    # layout sorted by b alone, same tile size (64 rows): every tile's
    # a-range is the full domain, so only the b-range prunes
    by_b = (
        df.select("a", "b", (F.col("b") * 64 + F.col("a")).alias("pos"))
        .select("a", "b", (F.col("pos") / 64).cast("long").alias("tile"))
        .groupBy("tile")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("a").alias("min_a"), F.max("a").alias("max_a"),
            F.min("b").alias("min_b"), F.max("b").alias("max_b"),
        )
        .collect()
    )
    b_kept = sum(
        r["n_rows"]
        for r in by_b
        if not (r["max_a"] < box[0] or r["min_a"] > box[1]
                or r["max_b"] < box[2] or r["min_b"] > box[3])
    )
    assert z_kept < b_kept  # z-layout reads strictly less
    assert z_kept == 64  # and exactly the one tile containing the box


def test_tile_stats_rejects_out_of_range_dims(spark):
    import pytest

    from dedupe_spark.operators.zorder import zorder_tile_stats

    big = spark.createDataFrame([(70000, 1), (2, 3)], "a long, b long")
    with pytest.raises(ValueError, match="must fit"):
        zorder_tile_stats(big, "a", "b", 8, (0, 10, 0, 10)).collect()
    neg = spark.createDataFrame([(-1, 1)], "a long, b long")
    with pytest.raises(ValueError, match="must fit"):
        zorder_tile_stats(neg, "a", "b", 8, (0, 10, 0, 10)).collect()
