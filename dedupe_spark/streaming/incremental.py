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
