"""Structured Streaming variants of the ingest/dedup front of the pipeline.

The reference is batch-only (SURVEY.md §2.8 — no streams), but the Iceberg
checkpoint layout leaves room for an incremental, `warc_ts`-watermarked
variant: new crawl files land in a directory, are normalized and blocked
incrementally, and exact dups are dropped within the watermark window.

Full learned-pairwise clustering stays batch (it is iterative/global);
streaming handles the *monotone* front: ingest, normalize, block-key
emission, exact dedup, and windowed stats. That split — streaming ingest +
periodic batch re-cluster over checkpointed state — is the standard
lambda-ish deployment for web-scale ER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream of pages parquet drops (new crawl shards)."""
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_block_keys(pages: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Incremental block-key emission: (url, bk, warc_ts), watermarked.

    Uses the same JVM-side host/prefix predicates as the batch pipeline;
    stateless projection + explode, so it runs in append mode with no state
    store growth.
    """
    host = F.regexp_replace(
        F.regexp_extract("url", r"^[a-zA-Z]+://([^/]+)", 1), r"^www\.", ""
    )
    first_tok = F.lower(
        F.element_at(F.split(F.trim(F.col("text")), r"\s+"), 1)
    )
    keys = F.array(
        F.concat(F.lit("host:"), host),
        F.concat(F.lit("host_t1:"), host, F.lit("|"), first_tok),
    )
    return (
        pages.withWatermark("warc_ts", watermark)
        .select("url", "warc_ts", F.explode(keys).alias("bk"))
    )


def incremental_exact_dedup(
    pages: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup: first-seen url+text_hash wins inside the
    watermark window (dropDuplicates over streaming state)."""
    return (
        pages.withColumn("text_hash", F.sha2("text", 256))
        .withWatermark("warc_ts", watermark)
        .dropDuplicates(["text_hash"])
    )


EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def replay_windowed_event_counts(
    spark: SparkSession, events_path: str, window: str = "1 hour"
) -> DataFrame:
    """Replay an events parquet through a REAL streaming aggregation and
    return the final result as a batch DataFrame.

    File-source stream (availableNow trigger: process everything, then
    stop) -> event-time tumbling windows per event_type -> complete-mode
    memory sink. Complete mode because the replay ends exactly at max(ts):
    append mode would hold back every window not yet past the watermark,
    which on a bounded replay means the tail windows never emit. The
    output is deterministically comparable to the equivalent batch
    aggregate — that equivalence is the driver-checkable contract for the
    streaming path.
    """
    import hashlib
    import os
    import tempfile

    # deterministic per-input names so repeated replays REUSE the staging
    # dir and replace the memory-sink table instead of leaking one of each
    # per call into /tmp and the driver catalog
    tag = hashlib.sha256(
        f"{os.path.abspath(events_path)}|{window}".encode()
    ).hexdigest()[:12]
    name = f"evt_replay_{tag}"
    if spark.catalog.tableExists(name):
        spark.catalog.dropTempView(name)
    # the file stream source requires a *directory* of arriving files; a
    # single-parquet input is staged via symlink into a temp dir (exactly
    # the "shards land in a directory" deployment shape)
    if os.path.isfile(events_path):
        d = os.path.join(tempfile.gettempdir(), f"evt_stream_{tag}")
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, os.path.basename(events_path))
        if not os.path.exists(link):
            os.symlink(os.path.abspath(events_path), link)
        events_path = d
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_path)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            # string, not timestamp: cross-engine value-hash comparisons
            # must not depend on pandas datetime unit (ns vs us) semantics
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return spark.table(name)


def windowed_page_counts(
    pages: DataFrame, window: str = "1 minute", watermark: str = "5 minutes"
) -> DataFrame:
    """Per-language tumbling-window page counts with late-data handling —
    the monitoring aggregate for the streaming ingest path."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages")
    )
