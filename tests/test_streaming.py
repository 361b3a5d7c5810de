"""Structured Streaming front-of-pipeline tests (file source + memory sink)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dedupe_spark.fixtures import make_pages
from dedupe_spark.pipeline import pages_df
from dedupe_spark.streaming import (
    incremental_exact_dedup,
    stream_pages,
    streaming_block_keys,
    windowed_page_counts,
)


@pytest.fixture(scope="module")
def page_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    pages_pd, _ = make_pages(n_base=60, seed=42)
    # two "crawl shard" drops
    half = len(pages_pd) // 2
    pages_df(spark, pages_pd.iloc[:half]).write.mode("overwrite").parquet(
        str(d / "shard1")
    )
    pages_df(spark, pages_pd.iloc[half:]).coalesce(1).write.mode("append").parquet(
        str(d / "shard1")
    )
    return str(d / "shard1"), pages_pd


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_block_keys(spark, page_dir):
    path, pages_pd = page_dir
    out = _run_stream(
        spark, streaming_block_keys(stream_pages(spark, path)), "blk_sink"
    )
    rows = out.collect()
    assert len(rows) == 2 * len(pages_pd)  # two keys per page
    assert all(r["bk"].startswith(("host:", "host_t1:")) for r in rows)


def test_incremental_exact_dedup(spark, page_dir):
    path, pages_pd = page_dir
    out = _run_stream(
        spark, incremental_exact_dedup(stream_pages(spark, path)), "dedup_sink"
    )
    n_unique_texts = pages_pd["text"].nunique()
    assert out.count() == n_unique_texts


def test_windowed_page_counts(spark, page_dir):
    path, pages_pd = page_dir
    out = _run_stream(
        spark,
        windowed_page_counts(stream_pages(spark, path), window="10 minutes"),
        "win_sink",
    )
    rows = out.collect()
    # append mode emits only closed windows (watermark passed); with
    # availableNow the final windows may be withheld, so assert on shape
    assert set(out.columns) == {"window_start", "lang", "n_pages"}
    assert all(r["n_pages"] >= 1 for r in rows)


def test_replay_windowed_event_counts_equals_batch(spark):
    """The streaming replay aggregate (complete mode, availableNow) must
    equal the straight batch aggregation of the same parquet — the
    driver-contract guarantee behind queries.streaming_window_counts."""
    from pyspark.sql import functions as F

    from dedupe_spark.streaming.incremental import replay_windowed_event_counts

    path = "/root/testdata/sf0.001/events.parquet"
    got = replay_windowed_event_counts(spark, path)
    batch = (
        spark.read.parquet(path)
        .groupBy(
            F.date_trunc("hour", "ts").cast("string").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_replay_reuses_resources_on_repeat(spark):
    """Repeated replays of the same input must reuse the staging dir and
    replace (not leak) the memory-sink table."""
    from dedupe_spark.streaming.incremental import replay_windowed_event_counts

    path = "/root/testdata/sf0.001/events.parquet"
    a = sorted(map(tuple, replay_windowed_event_counts(spark, path).collect()))
    b = sorted(map(tuple, replay_windowed_event_counts(spark, path).collect()))
    assert a == b
    replay_tables = [
        t.name for t in spark.catalog.listTables()
        if t.name.startswith("evt_replay_")
    ]
    assert len(replay_tables) == 1
