"""Multimodal column handling: image/audio/video as opaque binary + metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with
typed metadata structs; decode/resize/frame-sample run as Arrow-batched
``mapInPandas`` stages so each worker touches only its partition's bytes.
The actual codecs (PIL/ffmpeg/librosa) are NOT installed in this sandbox —
the decode kernels below are deterministic fakes / NotImplementedError
gates clearly marked ``STUB``; everything Spark-side (schemas, batch
iteration, partitioning, metadata extraction) is real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Media table schema: the payload stays an opaque binary column; typed
# metadata rides alongside so planning (filters, partition pruning) never
# touches bytes.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_hash", StringType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def _fake_decode_features(content: bytes, dim: int = 8) -> list[float]:
    """STUB decode: deterministic pseudo-features from the byte stream.

    Stands in for a real decode->embed step (PIL/torchvision/librosa are not
    in this container). Deterministic so tests are stable; replace the body
    with a real decoder on a cluster with codecs installed.
    """
    if content is None:
        return []
    h = hashlib.sha256(content).digest()
    vals = struct.unpack(f"<{dim}I", h[: 4 * dim])
    return [v / 0xFFFFFFFF for v in vals]


def real_decode_gate(kind: str) -> None:
    """STUB gate for the true codec path."""
    raise NotImplementedError(
        f"real {kind} decoding requires media codecs not present in this "
        "environment; the pipeline plumbing uses _fake_decode_features"
    )


def extract_media_features(
    media: DataFrame, dim: int = 8, batch_size_hint: int = 256
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    The iterator-of-batches shape is the real contract: each Arrow batch
    holds ~spark.sql.execution.arrow.maxRecordsPerBatch rows, bytes never
    concatenate across rows, output schema is fixed (FEATURE_SCHEMA).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["content"].map(lambda b: _fake_decode_features(b, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "content_hash": pdf["content"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                        if b is not None
                        else None
                    ),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        extract, FEATURE_SCHEMA
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only projection — runs without ever reading ``content``
    thanks to parquet column pruning (check ReadSchema in .explain)."""
    return media.select(
        "media_id",
        "kind",
        "mime",
        "width",
        "height",
        "duration_ms",
        F.length("content").alias("n_bytes"),
    )


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per planned frame
    timestamp (real decode is stubbed). Demonstrates the explode shape a
    real frame sampler uses; downstream stages join frames back by
    (media_id, frame_ts)."""
    return (
        media.where(F.col("kind") == "video")
        .where(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.col("duration_ms") - 1,
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_ts"),
        )
    )


def media_near_dup_pairs(
    media: DataFrame, threshold: float = 0.999, max_block: int = 2000
) -> DataFrame:
    """Exact + near duplicate media via content hash then feature cosine.

    Stage 1: byte-identical groups by sha2 (cheap, no decode).
    Stage 2: cosine over stub features for the rest (real features on a
    codec-enabled cluster). Reuses the embedding dedup operator unchanged —
    media dedup IS embedding dedup once features exist.
    """
    from .dedup import embedding_cosine_pairs

    feats = extract_media_features(media)
    return embedding_cosine_pairs(
        feats.where(F.size("feature") > 0),
        "media_id",
        vec_col="feature",
        threshold=threshold,
        max_block=max_block,
    )


def make_media_fixture(n: int = 20, seed: int = 42) -> pd.DataFrame:
    """Deterministic media fixture: fake bytes, two exact-dup pairs."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        content = bytes(rng.getrandbits(8) for _ in range(64 + i))
        rows.append(
            dict(
                media_id=f"m{i:03d}",
                kind=kind,
                content=content,
                mime={"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                width=640 if kind != "audio" else None,
                height=480 if kind != "audio" else None,
                duration_ms=5000 if kind != "image" else None,
            )
        )
    # exact duplicate contents
    rows[5]["content"] = rows[2]["content"]
    rows[11]["content"] = rows[8]["content"]
    return pd.DataFrame(rows)
