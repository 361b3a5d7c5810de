"""From-scratch WARC (ISO 28500) source — the container format
Common Crawl actually ships, i.e. the physical shape of the north-star
input (BASELINE.json: "Iceberg tables of Common-Crawl-style web pages";
this source is the step that turns raw crawl archives INTO that table).
No warcio/external deps: record framing, header parsing, HTTP response
payload splitting and per-record-gzip (the Common Crawl layout —
each record an independent gzip member) are all stdlib.

Format essentials handled here:
- a WARC file is a concatenation of records: ``WARC/1.x CRLF`` +
  header lines (``Name: value``) + CRLF + ``Content-Length`` payload
  bytes + CRLF CRLF;
- ``.warc.gz`` files are a concatenation of gzip MEMBERS, one per
  record (so HTTP range readers can fetch single records) — decoded by
  looping zlib with ``16 + MAX_WBITS`` over the unused tail;
- only ``WARC-Type: response`` records carry pages; their payload is an
  HTTP/1.x response whose body (after the first CRLFCRLF) is the HTML.

Scale design: the parallel unit is the ARCHIVE FILE — Spark's
``binaryFile`` source lists and distributes files (Common Crawl segments
are ~1 GB each, crawls are ~100k files: natural 100 TB parallelism);
each task parses its files with :func:`iter_warc_records` — a
streaming scan, one pass, no seeks — and emits one row per response via
``mapInPandas`` (Arrow batches; bytes never hit the driver). The output
schema IS the input_hint table minus text/lang: feed it to
``Pipeline(extract_html=...)`` and the ingest front is closed
end-to-end: archive → pages table → ER clusters.

Caveat (documented, not hidden): ``binaryFile`` materializes a whole
archive per row — fine for Common Crawl's ~1 GB segments on executors
with a few GB of heap; a >10 GB monolithic archive needs a split-aware
reader (gzip members ARE seekable split points) which this sandbox
cannot exercise.
"""

from __future__ import annotations

import os
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "iter_warc_records",
    "split_http_response",
    "read_warc",
    "read_warc_ranges",
    "write_warc",
    "build_response_record",
    "warc_pages",
    "WARC_SCHEMA",
]

WARC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("warc_type", StringType()),
        StructField("http_status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("html", BinaryType()),
        StructField("source_file", StringType()),
    ]
)

_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the .warc.gz layout).
    A corrupt tail (bad header bytes OR a mid-member CRC/stream error)
    keeps the good prefix instead of raising — one damaged crawl segment
    must not abort the whole scan (the module's malformed-input rule)."""
    out = []
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error:
            break  # corrupt tail: good prefix stands
        data = d.unused_data
        if not out[-2] and not out[-1] and data:
            break  # zero-progress tail: stop rather than loop forever
    return b"".join(out)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, payload)`` per WARC record from raw archive
    bytes (plain or per-record-gzip — sniffed by magic). Header names
    are lowercased; malformed tails stop iteration instead of raising
    (a truncated crawl segment should yield its good prefix)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            return  # desynchronized: stop at the good prefix
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                    "latin-1"
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        if clen < 0:
            return  # phantom record; pos would regress past desync checks
        body_start = hdr_end + 4
        if body_start + clen > n:
            return  # truncated record
        yield headers, data[body_start : body_start + clen]
        pos = body_start + clen


def split_http_response(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP/1.x response payload.
    A payload that is not an HTTP response comes back (None, None, payload)."""
    if not payload[:5] == b"HTTP/":
        return None, None, payload
    split = payload.find(_CRLF + _CRLF)
    if split < 0:
        return None, None, payload
    head = payload[:split].split(_CRLF)
    try:
        status = int(head[0].split(b" ", 2)[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in head[1:]:
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, payload[split + 4 :]


def _rows_from_record(path: str, headers: dict, payload: bytes) -> list[dict]:
    """0-or-1 output rows for one WARC record (response records only)."""
    wtype = headers.get("warc-type", "")
    if wtype != "response":
        return []
    status, ctype, body = split_http_response(payload)
    ts = headers.get("warc-date")
    try:
        # real crawls carry junk header values; a bad date must not fail
        # the task when framing-level corruption in the same file is
        # deliberately tolerated
        warc_ts = pd.Timestamp(ts).tz_localize(None) if ts else None
    except (ValueError, TypeError):
        warc_ts = None
    return [
        {
            "url": headers.get("warc-target-uri"),
            "warc_ts": warc_ts
            if warc_ts is not None
            else pd.Timestamp("1970-01-01"),
            "warc_type": wtype,
            "http_status": status,
            "content_type": ctype,
            "html": body,
            "source_file": path,
        }
    ]


def _records_from_archive(path: str, data: bytes) -> Iterator[dict]:
    for headers, payload in iter_warc_records(data):
        yield from _rows_from_record(path, headers, payload)


def read_warc(
    spark: SparkSession, path: str, split_bytes: int | None = None
) -> DataFrame:
    """Distributed WARC scan: one row per ``response`` record. ``path``
    accepts globs (``segments/*.warc.gz``).

    Two physical strategies:

    - ``split_bytes=None`` (default): parallel unit = archive FILE via
      the ``binaryFile`` source — right for Common Crawl's ~1 GB
      segments × ~100k files.
    - ``split_bytes=N``: parallel unit = BYTE RANGE within ``.warc.gz``
      archives (:func:`read_warc_ranges`) — gzip members are seekable
      split points, so one >10 GB monolithic archive fans out across
      the cluster instead of pinning a single task.

    Parsing always runs in Arrow-batched tasks; bytes never visit the
    driver (the ranged path's driver cost is one file listing)."""
    if split_bytes is not None:
        return read_warc_ranges(spark, path, split_bytes)
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def rows_of(b: pd.DataFrame) -> Iterator[dict]:
        for p, c in zip(b["path"], b["content"]):
            yield from _records_from_archive(p, bytes(c))

    return raw.mapInPandas(_parse_batches(rows_of), WARC_SCHEMA)


def _parse_batches(rows_of):
    """Shared mapInPandas wrapper: one parse loop + typed empty-batch
    fallback for both physical scans (a schema change cannot diverge
    them)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for b in batches:
            rows = list(rows_of(b))
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
            )

    return parse


# ---------------------------------------------------------------------------
# Split-aware ranged scan (>10 GB monolithic .warc.gz archives)
# ---------------------------------------------------------------------------

_GZ_MAGIC = b"\x1f\x8b\x08"
_CHUNK = 1 << 20


def _verify_member_at(f, offset: int) -> bool:
    """A gzip-member candidate is real iff its decompressed prefix is a
    WARC record header — the standard resync check (the magic bytes can
    occur inside compressed payloads)."""
    f.seek(offset)
    probe = f.read(512)
    try:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        return d.decompress(probe, 5) == b"WARC/"
    except zlib.error:
        return False


def _resync_gz(f, start: int, end: int) -> int | None:
    """First VERIFIED gzip-member offset in [start, end), or None.
    Candidates must START inside the range; the window therefore only
    needs ``end - start`` bytes (+2 for a magic straddling the edge —
    a straddler starts < end, so it is still this range's member)."""
    f.seek(start)
    window = f.read(end - start + len(_GZ_MAGIC) - 1)
    pos = 0
    while True:
        hit = window.find(_GZ_MAGIC, pos)
        if hit < 0:
            return None
        if _verify_member_at(f, start + hit):
            return start + hit
        pos = hit + 1


def _iter_range_records(
    path: str, start: int, end: int
) -> Iterator[tuple[dict, bytes]]:
    """WARC records from gzip members whose member START offset lies in
    [start, end) (task 0 additionally owns offset 0 without resync).
    The contract makes ranges disjoint and exhaustive: a member
    straddling ``end`` belongs to THIS range (read past end to finish
    it); the next range resyncs to its first member at ≥ its start."""
    with open(path, "rb") as f:
        if f.read(len(_GZ_MAGIC)) != _GZ_MAGIC:
            # plain (uncompressed) archive: no member split points exist,
            # so the whole file belongs to the start-0 range; other
            # ranges own nothing (same ownership contract, degenerate)
            if start == 0:
                f.seek(0)
                yield from iter_warc_records(f.read())
            return
        pos = start
        if pos > 0:
            synced = _resync_gz(f, pos, end)
            if synced is None:
                return
            pos = synced
        f.seek(pos)
        buf = b""
        while pos < end:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            out = []
            fed = 0  # compressed bytes consumed by this member
            while not d.eof:
                if not buf:
                    buf = f.read(_CHUNK)
                    if not buf:
                        break
                try:
                    out.append(d.decompress(buf))
                except zlib.error:
                    return  # corrupt member: good prefix stands
                fed += len(buf) - len(d.unused_data)
                buf = d.unused_data
            if not d.eof:
                return  # truncated final member: drop, good prefix stands
            yield from iter_warc_records(b"".join(out))
            pos += fed


def read_warc_ranges(
    spark: SparkSession, path: str, split_bytes: int = 64 << 20
) -> DataFrame:
    """Ranged ``.warc.gz`` scan: the driver lists files (metadata only)
    and fans out ``(path, start, end)`` byte ranges; each task seeks,
    resyncs to the next verified gzip member, and parses its members.

    Storage note (honest contract): tasks ``open()`` the path directly,
    so this needs POSIX-visible storage (local disk, NFS, a fuse mount).
    An object-store deployment would swap ``open``+``seek`` for ranged
    GETs — the split/resync protocol is identical.

    Layout contract: gzip members must be RECORD-ALIGNED (each member
    holds whole records — the Common Crawl layout, and what
    :func:`write_warc` emits). An archive whose records straddle member
    boundaries has no seekable split points; scan it with
    ``split_bytes=None`` (member-prefix verification would reject every
    resync candidate, so misaligned splits drop records rather than
    desynchronize)."""
    import glob as globmod

    files = sorted(globmod.glob(path)) if any(
        c in path for c in "*?["
    ) else [path]
    ranges = []
    for p in files:
        size = os.path.getsize(p)
        for off in range(0, max(size, 1), split_bytes):
            ranges.append((p, off, min(off + split_bytes, size)))
    rdf = spark.createDataFrame(
        ranges, "path string, start long, end long"
    ).repartition(max(len(ranges), 1))

    def rows_of(b: pd.DataFrame) -> Iterator[dict]:
        for p, s, e in zip(b["path"], b["start"], b["end"]):
            for headers, payload in _iter_range_records(p, int(s), int(e)):
                yield from _rows_from_record(p, headers, payload)

    return rdf.mapInPandas(_parse_batches(rows_of), WARC_SCHEMA)


# ---------------------------------------------------------------------------
# Sink: pages table → WARC archives (the round trip)
# ---------------------------------------------------------------------------


def build_response_record(
    url: str,
    ts_iso: str,
    html: bytes,
    status: int = 200,
    content_type: str = "text/html",
) -> bytes:
    """One deterministic WARC response record: same inputs → same bytes
    (record id is md5(url, date), no wall-clock anywhere)."""
    import hashlib

    http = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(html)}\r\n".encode()
        + _CRLF
        + html
    )
    rid = hashlib.md5(f"{url}|{ts_iso}".encode()).hexdigest()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts_iso}\r\n"
        "Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
    ).encode()
    return head + _CRLF + http + _CRLF + _CRLF


def write_warc(
    df: DataFrame, out_dir: str, gzip_members: bool = True
) -> DataFrame:
    """Sink a pages-shaped relation (url, warc_ts, html [, http_status,
    content_type]) to WARC archives: ONE archive per partition, each
    record an independent gzip member (``mtime=0`` → byte-deterministic
    output) — the Common Crawl layout :func:`read_warc` and the ranged
    scan consume. Executors write directly (bytes never on the driver);
    the returned relation is the small per-file manifest
    ``(file, n_records, bytes)`` — collect it to run the job.
    Partition count = archive count: ``df.repartition(n)`` first to
    choose segment sizing, exactly like parquet output files.

    Commit protocol: each task attempt writes an attempt-unique temp
    file and publishes it with an atomic rename — a retried or
    speculative duplicate attempt can never interleave bytes into a
    published archive (last finished attempt wins; both write identical
    content). NULL http_status/content_type fall back to 200/text/html,
    so ``read_warc`` output (where a non-HTTP payload yields NULLs) can
    be re-sunk directly. Sub-second ``warc_ts`` is preserved
    (ISO-8601 fractional WARC-Date) — the round trip stays lossless at
    microsecond precision."""
    import gzip as gzmod

    from pyspark import TaskContext
    from pyspark.sql.types import LongType

    os.makedirs(out_dir, exist_ok=True)
    out_schema = StructType(
        [
            StructField("file", StringType()),
            StructField("n_records", IntegerType()),
            StructField("bytes", LongType()),
        ]
    )
    has_status = "http_status" in df.columns
    has_ctype = "content_type" in df.columns
    cols = ["url", "warc_ts", "html"]
    cols += ["http_status"] if has_status else []
    cols += ["content_type"] if has_ctype else []
    ext = ".warc.gz" if gzip_members else ".warc"

    def _ts_iso(v) -> str:
        ts = pd.Timestamp(v)
        if ts.microsecond or ts.nanosecond:
            return ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        return ts.strftime("%Y-%m-%dT%H:%M:%SZ")

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        tmp = f"{fname}.attempt-{ctx.taskAttemptId()}.tmp"
        n = 0
        f = None
        for b in batches:
            if f is None:
                f = open(tmp, "wb")
            for _, row in b.iterrows():
                status = 200
                if has_status and pd.notna(row["http_status"]):
                    status = int(row["http_status"])
                ctype = "text/html"
                if has_ctype and pd.notna(row["content_type"]):
                    ctype = str(row["content_type"])
                rec = build_response_record(
                    row["url"],
                    _ts_iso(row["warc_ts"]),
                    bytes(row["html"]) if row["html"] is not None else b"",
                    status,
                    ctype,
                )
                f.write(gzmod.compress(rec, mtime=0) if gzip_members else rec)
                n += 1
        if f is None:
            yield pd.DataFrame(
                {"file": pd.Series(dtype=object), "n_records": pd.Series(dtype="int32"), "bytes": pd.Series(dtype="int64")}
            )
            return
        f.close()
        os.replace(tmp, fname)  # atomic publish; duplicate attempts race safely
        yield pd.DataFrame(
            [{"file": fname, "n_records": n, "bytes": os.path.getsize(fname)}]
        )

    return df.select(*cols).mapInPandas(sink, out_schema)


def warc_pages(
    spark: SparkSession,
    path: str,
    ok_only: bool = True,
    split_bytes: int | None = None,
) -> DataFrame:
    """Bridge to the input_hint table: (url, warc_ts, html, text, lang)
    with text/lang NULL — exactly what ``Pipeline(extract_html=...)``
    ingests. ``ok_only`` keeps HTTP 200 responses (the crawl default);
    ``split_bytes`` selects the ranged scan (see :func:`read_warc`)."""
    w = read_warc(spark, path, split_bytes=split_bytes)
    if ok_only:
        w = w.where(F.col("http_status") == 200)
    return w.select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
