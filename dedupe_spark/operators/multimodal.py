"""Multimodal column handling: image/audio/video as opaque binary + metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with
typed metadata structs; decode/resize/frame-sample run as Arrow-batched
``mapInPandas`` stages so each worker touches only its partition's bytes.

Decode status, honestly: header sniffing (`sniff_header`) is REAL for
all listed formats, and pixel/sample DECODE is now REAL for PNG, BMP,
GIF, WAV-PCM (functions/codecs.py) and baseline AND progressive JPEG
(functions/jpeg.py — from-scratch Huffman + DCT incl. SOF2 spectral
selection/successive approximation, r5) via pure python/numpy decoders
(`decode_media_features` — per-row `decoded` flag). Only WEBP/MP4 and
arithmetic/lossless JPEG profiles remain behind the deterministic-fake /
NotImplementedError STUB paths; everything Spark-side (schemas, batch
iteration, partitioning, metadata extraction) is real and tested
either way.
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
    while len(h) < 4 * dim:  # chain the digest for dims past 8
        h += hashlib.sha256(h).digest()
    vals = struct.unpack(f"<{dim}I", h[: 4 * dim])
    return [v / 0xFFFFFFFF for v in vals]


def real_decode_gate(kind: str) -> None:
    """STUB gate for formats whose decode requires an external codec
    (WEBP/MP4, and arithmetic/lossless JPEG profiles). PNG, BMP, GIF,
    WAV and baseline + progressive JPEG are NOT gated — their decode is real
    (functions/codecs.py + functions/jpeg.py, surfaced via
    decode_media_features)."""
    raise NotImplementedError(
        f"real {kind} decoding requires media codecs not present in this "
        "environment; the pipeline plumbing uses _fake_decode_features "
        "(png/bmp/gif/wav/baseline-jpeg decode IS real — see "
        "decode_media_features)"
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


DECODED_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("format", StringType(), True),
        StructField("decoded", StringType(), False),  # real | fake | error
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate_hz", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def decode_media_features(
    media: DataFrame, content_col: str = "content", dim: int = 64
) -> DataFrame:
    """REAL pixel/sample decode where no codec is needed, honest fallback
    elsewhere: routes each row by its SNIFFED format (never the mime
    column) — PNG/BMP/GIF/JPEG (baseline + progressive) through the
    pure-python pixel
    decoders to a 64-dim
    grayscale block-mean vector, WAV through the PCM decoder to a 64-bin
    RMS envelope, codec-gated formats (webp/mp4, arithmetic jpeg) to the
    deterministic fake with ``decoded='fake'``, and malformed bytes to
    ``decoded='error'`` with a null feature instead of a dead executor
    (the untrusted-bytes contract). Features from 'real' and 'fake' rows
    share one vector space per format family, so
    :func:`~dedupe_spark.operators.dedup.embedding_cosine_pairs` composes
    on the output unchanged.
    """
    from ..functions import codecs as C
    from ..functions.jpeg import decode_jpeg as _decode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf[content_col]):
                b = bytes(b) if b is not None else None
                fmt = sniff_header(b)[0]
                rec = dict(
                    media_id=mid, format=fmt, decoded="fake",
                    width=None, height=None, channels=None,
                    sample_rate_hz=None, n_samples=None,
                    feature=_fake_decode_features(b, dim) if b else None,
                )
                try:
                    if fmt in ("png", "bmp", "gif", "jpeg"):
                        px = {
                            "png": C.decode_png,
                            "bmp": C.decode_bmp,
                            "gif": C.decode_gif,
                            "jpeg": _decode_jpeg,
                        }[fmt](b)
                        rec.update(
                            decoded="real",
                            height=px.shape[0], width=px.shape[1],
                            channels=px.shape[2] if px.ndim == 3 else 1,
                            feature=C.image_features(px),
                        )
                    elif fmt == "wav":
                        samples, rate = C.decode_wav(b)
                        rec.update(
                            decoded="real",
                            channels=samples.shape[1],
                            sample_rate_hz=rate,
                            n_samples=samples.shape[0],
                            feature=C.audio_features(samples, rate),
                        )
                except C.UnsupportedCodecFeature:
                    pass  # valid bytes outside profile -> honest 'fake'
                except C.CodecError:
                    rec.update(decoded="error", feature=None)
                rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_FEATURE_SCHEMA]
            )

    return media.select("media_id", content_col).mapInPandas(
        run, DECODED_FEATURE_SCHEMA
    )


def sniff_header(b: bytes | None) -> tuple:
    """REAL (not stubbed) container-header parse from magic bytes — needs
    no codec, only struct: format, width, height, sample_rate_hz, channels,
    any of which may be None. Pixel/sample DECODING stays behind the stub
    gate; sniffing is pure byte arithmetic and is what a 100 TB ingest
    actually runs first (validate + route by real container type, never
    trusting the upstream mime column).

    Formats: PNG (IHDR), JPEG (SOF0-15 scan), GIF (87a/89a), BMP
    (BITMAPINFOHEADER), RIFF/WAVE (fmt chunk), RIFF/WEBP, MP4 (ftyp brand).
    """
    none5 = (None, None, None, None, None)
    if not b:
        return none5

    def _i32(v):
        # header fields are parsed UNSIGNED: a crafted/corrupt value over
        # int32 must become None, not crash the Arrow Int32 cast and with
        # it the whole ingest job (the untrusted-bytes contract)
        return int(v) if 0 <= v <= 0x7FFFFFFF else None

    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            w, h = struct.unpack(">II", b[16:24])
            return ("png", _i32(w), _i32(h), None, None)
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 1 < len(b):
                if b[i] != 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker == 0xFF:  # spec-legal fill byte: FF FF ... marker
                    i += 1
                    continue
                if marker == 0xD9:  # EOI: no SOF seen, still a jpeg
                    break
                # SOFn markers carry dimensions (C4/C8/CC are not SOF)
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if i + 9 > len(b):
                        break
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return ("jpeg", _i32(w), _i32(h), None, None)
                if marker in (0xD8, 0x00, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                if i + 4 > len(b):
                    break
                seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
                i += 2 + max(seglen, 2)  # a 0/1 length must still advance
            return ("jpeg", None, None, None, None)
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return ("gif", w, h, None, None)
        if b[:2] == b"BM" and len(b) >= 26:
            w, h = struct.unpack("<ii", b[18:26])
            return ("bmp", _i32(w), _i32(abs(h)), None, None)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                clen = struct.unpack("<I", b[i + 4 : i + 8])[0]
                if cid == b"fmt " and i + 16 <= len(b):
                    channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
                    return ("wav", None, None, _i32(rate), _i32(channels))
                i += 8 + clen + (clen & 1)
            return ("wav", None, None, None, None)
        if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            return ("webp", None, None, None, None)
        if len(b) >= 12 and b[4:8] == b"ftyp":
            return ("mp4", None, None, None, None)
    except struct.error:
        pass
    return none5


SNIFF_SCHEMA = StructType(
    [
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate_hz", IntegerType(), True),
        StructField("channels", IntegerType(), True),
    ]
)


def sniff_media_headers(media: DataFrame, content_col: str = "content") -> DataFrame:
    """Add a ``sniffed`` struct column from the REAL header parse — an
    Arrow-batched pandas UDF over the binary column (bytes cross once per
    row, no Python round-trip per field)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(SNIFF_SCHEMA)
    def _sniff(contents: pd.Series) -> pd.DataFrame:
        rows = [sniff_header(b) for b in contents]
        return pd.DataFrame(
            rows,
            columns=["format", "width", "height", "sample_rate_hz", "channels"],
        ).astype(
            {
                "width": "Int32",
                "height": "Int32",
                "sample_rate_hz": "Int32",
                "channels": "Int32",
            }
        )

    return media.withColumn("sniffed", _sniff(F.col(content_col)))


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


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("format", StringType(), True),
        StructField("decoded", StringType(), False),
        StructField("dhash", LongType(), True),
    ]
)

DHASH_BANDS = 4  # 4 x 16-bit chunks of the 64-bit hash


def media_dhash(media: DataFrame, content_col: str = "content") -> DataFrame:
    """64-bit perceptual dHash per media row — REAL pixels only: rows
    whose sniffed format decodes through the pure-python codecs
    (PNG/BMP/GIF/baseline JPEG) carry ``decoded='real'`` and the hash;
    codec-gated or audio rows carry NULL (an image perceptual hash over
    fake features would manufacture false near-dups, so honesty means
    absence); malformed bytes degrade to ``decoded='error'``, never a
    dead executor. Arrow-batched ``mapInPandas``; the int is stored as
    signed int64 (two's complement) so the banding arithmetic below is
    pure JVM bit math."""
    from ..functions import codecs as C
    from ..functions.jpeg import decode_jpeg as _decode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf[content_col]):
                b = bytes(b) if b is not None else None
                fmt = sniff_header(b)[0]
                rec = dict(media_id=mid, format=fmt, decoded="fake", dhash=None)
                try:
                    if fmt in ("png", "bmp", "gif", "jpeg"):
                        px = {
                            "png": C.decode_png,
                            "bmp": C.decode_bmp,
                            "gif": C.decode_gif,
                            "jpeg": _decode_jpeg,
                        }[fmt](b)
                        u = C.dhash64(px)
                        rec.update(
                            decoded="real",
                            dhash=u - (1 << 64) if u >= (1 << 63) else u,
                        )
                except C.UnsupportedCodecFeature:
                    pass
                except C.CodecError:
                    rec.update(decoded="error")
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in DHASH_SCHEMA])

    return media.select("media_id", content_col).mapInPandas(run, DHASH_SCHEMA)


def media_dhash_pairs(hashed: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual near-duplicate image pairs from dHash values — the
    image-side counterpart of simhash_pairs, with the same pigeonhole
    blocking: split each 64-bit hash into DHASH_BANDS 16-bit chunks;
    two hashes within ``max_hamming`` (< DHASH_BANDS) bits MUST agree
    on at least one chunk, so the candidate join runs per
    (band_idx, band_value) bucket — candidate volume n²/2¹⁶ per band,
    not n² — and exact Hamming verification (bit_count of xor, pure
    JVM) keeps only true pairs, each found-once via the min-band rule
    (only the FIRST agreeing band emits the pair: no distinct pass).
    At 100 TB the bucket join inherits the engine's standard block-size
    story (a degenerate bucket — e.g. all-black thumbnails hashing to
    0 — is a genuine duplicate class, not skew noise).

    hashed: output of media_dhash (real rows only are considered).
    Returns (id1, id2, hamming)."""
    h = hashed.where(
        (F.col("decoded") == "real") & F.col("dhash").isNotNull()
    ).select(F.col("media_id").alias("id"), F.col("dhash"))
    bands = h.select(
        "id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("dhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bv"),
                    )
                    for i in range(DHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select(
        "id", "dhash", F.col("b.band").alias("band"), F.col("b.bv").alias("bv")
    )
    l = bands.select(
        "band", "bv", F.col("id").alias("id1"), F.col("dhash").alias("h1")
    )
    r = bands.select(
        F.col("band").alias("band2"),
        F.col("bv").alias("bv2"),
        F.col("id").alias("id2"),
        F.col("dhash").alias("h2"),
    )
    cand = l.join(
        r,
        (l.band == r.band2) & (l.bv == r.bv2) & (l.id1 < r.id2),
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    # min-band rule: emit only from the smallest agreeing band index
    first_band = (
        cand.select("id1", "id2", "band", "h1", "h2")
        .groupBy("id1", "id2", "h1", "h2")
        .agg(F.min("band").alias("b0"))
    )
    return (
        first_band.select(
            "id1", "id2", ham.alias("hamming")
        )
        .where(F.col("hamming") <= max_hamming)
    )


# deterministic grayscale test-image parameters shared with the gate
# oracle (the pii_scrub synthesis idiom): 24x27 makes the 8x9 dHash grid
# land on exact multiples (ys = 3r, xs = 3c) so the oracle can address
# sampled pixels by formula
SYNTH_IMG_H = 24
SYNTH_IMG_W = 27


def synth_pixel(key: str, y: int, x: int) -> int:
    """The shared pixel formula: a diagonal gradient plus md5 noise —
    px = (2x + y + hexdigit(md5(key:y:x))) % 256. Pure arithmetic both
    engines express identically."""
    import hashlib

    noise = int(hashlib.md5(f"{key}:{y}:{x}".encode()).hexdigest()[0], 16)
    return (2 * x + y + noise) % 256


def synthesize_gray_png_bytes(key: str) -> bytes:
    """Minimal grayscale PNG (color type 0, bit depth 8, filter 0 rows)
    of the shared pixel formula — the PNG-side twin of the BMP
    synthesizer, so the SAME oracle certifies the zlib/filter decode
    path."""
    import struct as _struct
    import zlib as _zlib

    w, h = SYNTH_IMG_W, SYNTH_IMG_H
    raw = b"".join(
        b"\x00" + bytes(synth_pixel(key, y, x) for x in range(w))
        for y in range(h)
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + typ
            + data
            + _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synthesize_gray_bmp(
    keys: DataFrame, key_col: str = "media_id", fmt: str = "bmp"
) -> DataFrame:
    """Deterministic gate-fixture device: one 24-bit grayscale BMP per
    key row, pixels from :func:`synth_pixel` (equal R=G=B channels so
    decoded luminance equals the formula value exactly). Real encoder
    output — the gate query pushes these bytes through the REAL
    sniff→decode→dhash chain, which is what makes the multimodal
    family value-oracle-able: the oracle recomputes the dhash from the
    pixel formula and a hash mismatch would expose any defect anywhere
    in the encode/decode/hash pipeline. Arrow-batched ``mapInPandas``;
    bytes are built per row, never concatenated across rows."""
    import struct as _struct

    h, w = SYNTH_IMG_H, SYNTH_IMG_W
    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("content", BinaryType(), True),
        ]
    )

    def encode_one(key: str) -> bytes:
        stride = (w * 3 + 3) & ~3
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up rows
            row = bytearray()
            for x in range(w):
                v = synth_pixel(key, y, x)
                row += bytes((v, v, v))
            row += b"\x00" * (stride - len(row))
            body += row
        hdr = (
            b"BM"
            + _struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + _struct.pack(
                "<IiiHHIIiiII",
                40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
            )
        )
        return hdr + bytes(body)

    enc = synthesize_gray_png_bytes if fmt == "png" else encode_one

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[key_col],
                    "content": pdf[key_col].map(enc),
                }
            )

    return keys.select(key_col).mapInPandas(run, schema)


SYNTH_WAV_N = 256  # samples per synthesized clip
SYNTH_WAV_RATE = 8000
WAV_ENV_BINS = 8  # envelope bins of 32 samples each


def synth_sample(key: str, i: int) -> int:
    """Shared 8-bit PCM sample formula: (3i + 7·hexdigit(md5(key:i)))
    mod 256 — same synthesis idiom as synth_pixel."""
    import hashlib

    noise = int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[0], 16)
    return (3 * i + 7 * noise) % 256


def synthesize_wav(keys: DataFrame, key_col: str = "media_id") -> DataFrame:
    """Deterministic gate-fixture device: one 8-bit mono PCM WAV per key
    (stdlib ``wave`` writer, canonical 44-byte RIFF header), samples
    from :func:`synth_sample`. The gate query pushes the BYTES through
    the real sniff→decode chain; the oracle recomputes the envelope
    from the formula."""
    import io as _io
    import wave as _wave

    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("content", BinaryType(), True),
        ]
    )

    def encode_one(key: str) -> bytes:
        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(1)
            wf.setframerate(SYNTH_WAV_RATE)
            wf.writeframes(
                bytes(synth_sample(key, i) for i in range(SYNTH_WAV_N))
            )
        return buf.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[key_col],
                    "content": pdf[key_col].map(encode_one),
                }
            )

    return keys.select(key_col).mapInPandas(run, schema)


WAV_ENVELOPE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("bin", IntegerType(), False),
        StructField("ss", LongType(), False),
    ]
)


def wav_envelope_ints(
    media: DataFrame, content_col: str = "content"
) -> DataFrame:
    """Exact-integer RMS envelope state from REAL WAV decode: per
    (clip, bin) the int64 sum of squared centered samples — the raw
    8-bit values are recovered EXACTLY from the decoder's [-1, 1]
    floats because (v-128)/128 and its inverse are power-of-two float
    ops. Integer output means the oracle comparison carries no float
    tolerance at all: a single wrong sample anywhere in the RIFF
    parse would shift a sum. Arrow-batched; rows whose bytes do not
    sniff as WAV are dropped (the gate corpus is all-WAV by
    construction)."""
    import numpy as np

    from ..functions import codecs as C

    bin_w = SYNTH_WAV_N // WAV_ENV_BINS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf[content_col]):
                b = bytes(b) if b is not None else None
                if sniff_header(b)[0] != "wav":
                    continue
                samples, _rate = C.decode_wav(b)
                raw = np.rint(samples[:, 0] * 128.0 + 128.0).astype(
                    np.int64
                )
                centered = raw - 128
                for bi in range(len(raw) // bin_w):
                    seg = centered[bi * bin_w : (bi + 1) * bin_w]
                    rows.append(
                        dict(
                            media_id=mid,
                            bin=bi,
                            ss=int((seg * seg).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_ENVELOPE_SCHEMA]
            )

    return media.select("media_id", content_col).mapInPandas(
        run, WAV_ENVELOPE_SCHEMA
    )


def synth_pixel_grouped(
    group_key: str, doc_key: str, y: int, x: int
) -> int:
    """Pixel formula for the near-dup pair oracle: a per-GROUP base
    pattern (gradient + md5 noise keyed by the group), plus a rare
    per-DOC perturbation (+16, p = 1/256 per dHash-sampled cell), so
    documents in one group render near-identical images (Hamming ~0-4)
    and cross-group images are unrelated (~32 bits). Perturbations
    apply only at dHash grid coordinates (y, x both multiples of 3),
    which keeps the oracle's sampled-pixel recomputation exact."""
    import hashlib

    noise = int(
        hashlib.md5(f"{group_key}:{y}:{x}".encode()).hexdigest()[0], 16
    )
    px = (2 * x + y + 8 * noise) % 256
    if (
        y % 3 == 0
        and x % 3 == 0
        and hashlib.md5(f"{doc_key}:{y}:{x}".encode()).hexdigest()[:2]
        == "00"
    ):
        px = (px + 16) % 256
    return px


def synthesize_grouped_bmp(keys: DataFrame) -> DataFrame:
    """Grouped-image fixture device for the pair-join oracle: one BMP
    per (media_id, group_key) row, pixels from synth_pixel_grouped."""
    import struct as _struct

    h, w = SYNTH_IMG_H, SYNTH_IMG_W
    schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("content", BinaryType(), True),
        ]
    )

    def encode_one(mid: str, gk: str) -> bytes:
        stride = (w * 3 + 3) & ~3
        body = bytearray()
        for y in range(h - 1, -1, -1):
            row = bytearray()
            for x in range(w):
                v = synth_pixel_grouped(gk, mid, y, x)
                row += bytes((v, v, v))
            row += b"\x00" * (stride - len(row))
            body += row
        hdr = (
            b"BM"
            + _struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + _struct.pack(
                "<IiiHHIIiiII",
                40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
            )
        )
        return hdr + bytes(body)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": [
                        encode_one(m, g)
                        for m, g in zip(pdf["media_id"], pdf["group_key"])
                    ],
                }
            )

    return keys.select("media_id", "group_key").mapInPandas(run, schema)
