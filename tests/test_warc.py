"""WARC source (sources/warc.py): from-scratch ISO 28500 parsing, the
per-record-gzip Common Crawl layout, the distributed binaryFile scan, and
the bridge into the input_hint pages table.

Fixture archives are synthesized in-test (deterministic bytes) — the
round-trip asserts byte-identical html payloads, the north rule's
per-row invariant at the ingest boundary.
"""

from __future__ import annotations

import gzip
import os

import pytest

from dedupe_spark.pipeline import fill_text_from_html
from dedupe_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    split_http_response,
    warc_pages,
)

CRLF = b"\r\n"


def _record(wtype: str, uri: str, date: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return head + CRLF + payload + CRLF + CRLF


def _http(status: int, ctype: str, body: bytes) -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n".encode()
        + CRLF
        + body
    )


BODY_A = b"<html><body><p>alpha page \xe2\x9c\x93</p></body></html>"
BODY_B = b"<html><title>beta</title><p>beta body</p></html>"
BODY_C = b"<html><p>redirected</p></html>"


def _archive() -> bytes:
    """warcinfo + request + 2×200 responses + one 301 response."""
    return b"".join(
        [
            _record("warcinfo", "-", "2024-01-01T00:00:00Z", b"software: test"),
            _record(
                "request",
                "http://a.example/x",
                "2024-01-01T00:00:01Z",
                b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n",
            ),
            _record(
                "response",
                "http://a.example/x",
                "2024-01-01T00:00:01Z",
                _http(200, "text/html; charset=utf-8", BODY_A),
            ),
            _record(
                "response",
                "http://b.example/y",
                "2024-02-02T12:30:00Z",
                _http(200, "text/html", BODY_B),
            ),
            _record(
                "response",
                "http://c.example/z",
                "2024-03-03T03:00:00Z",
                _http(301, "text/html", BODY_C),
            ),
        ]
    )


def _gz_members(archive: bytes) -> bytes:
    """Common Crawl layout: each record its own gzip member. Record
    framing follows Content-Length (payloads may themselves contain
    CRLFCRLF — e.g. the HTTP header/body split — so searching for the
    delimiter would cut mid-record)."""
    out = []
    pos = 0
    while pos < len(archive):
        hdr_end = archive.find(CRLF + CRLF, pos)
        clen = next(
            int(line.split(b":")[1])
            for line in archive[pos:hdr_end].split(CRLF)
            if line.lower().startswith(b"content-length")
        )
        end = hdr_end + 4 + clen + 4
        out.append(gzip.compress(archive[pos:end], mtime=0))
        pos = end
    return b"".join(out)


# -- pure parsing ----------------------------------------------------------


def test_iter_warc_records_plain():
    recs = list(iter_warc_records(_archive()))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo",
        "request",
        "response",
        "response",
        "response",
    ]
    h, payload = recs[2]
    assert h["warc-target-uri"] == "http://a.example/x"
    status, ctype, body = split_http_response(payload)
    assert (status, ctype) == (200, "text/html; charset=utf-8")
    assert body == BODY_A  # byte-identical round-trip


def test_iter_warc_records_gzip_members():
    gz = _gz_members(_archive())
    # sanity: the fixture really is multi-member
    assert gz.count(b"\x1f\x8b\x08") >= 5
    recs = list(iter_warc_records(gz))
    assert len(recs) == 5
    assert recs[3][0]["warc-target-uri"] == "http://b.example/y"


def test_truncated_archive_yields_good_prefix():
    data = _archive()
    # cut inside the 4th record's payload: first 3 survive
    cut = data.find(b"beta body")
    recs = list(iter_warc_records(data[:cut]))
    assert len(recs) == 3
    # desynchronized garbage after a good record also stops cleanly
    recs2 = list(iter_warc_records(data[: data.find(b"WARC/", 10)] + b"junk"))
    assert len(recs2) == 1


def test_split_http_response_non_http():
    status, ctype, body = split_http_response(b"not an http payload")
    assert status is None and ctype is None and body == b"not an http payload"
    # status line present but unparseable status code
    status, _, _ = split_http_response(b"HTTP/1.1 abc\r\n\r\nx")
    assert status is None


# -- distributed scan ------------------------------------------------------


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warcs")
    (d / "seg-00000.warc").write_bytes(_archive())
    (d / "seg-00001.warc.gz").write_bytes(_gz_members(_archive()))
    return str(d)


def test_read_warc_scan(spark, warc_dir):
    df = read_warc(spark, os.path.join(warc_dir, "*.warc*"))
    rows = df.orderBy("source_file", "url").collect()
    # 3 responses per archive × 2 archives; warcinfo/request filtered
    assert len(rows) == 6
    assert {r.http_status for r in rows} == {200, 301}
    a = [r for r in rows if r.url == "http://a.example/x"]
    assert len(a) == 2  # once per archive
    for r in a:
        assert bytes(r.html) == BODY_A
        assert r.warc_ts.isoformat() == "2024-01-01T00:00:01"
        assert r.content_type == "text/html; charset=utf-8"


def test_warc_pages_bridge(spark, warc_dir):
    pages = warc_pages(spark, os.path.join(warc_dir, "seg-00000.warc"))
    assert [f.name for f in pages.schema.fields] == [
        "url",
        "warc_ts",
        "html",
        "text",
        "lang",
    ]
    rows = pages.collect()
    assert len(rows) == 2  # ok_only drops the 301
    assert all(r.text is None and r.lang is None for r in rows)
    # ok_only=False keeps it
    assert warc_pages(spark, os.path.join(warc_dir, "seg-00000.warc"), ok_only=False).count() == 3


def test_corrupt_tails_keep_good_prefix():
    """Framing-level corruption never raises: bad gzip header bytes,
    mid-member garbage, and negative Content-Length all yield the good
    prefix (one damaged crawl segment must not abort a 100k-file scan)."""
    import gzip

    good = gzip.compress(
        _record("response", "http://ok.example/", "2024-01-01T00:00:00Z",
                _http(200, "text/html", b"<html>ok</html>")), mtime=0)
    # corrupt gzip header after a valid member
    recs = list(iter_warc_records(good + b"\x1f\x8bGARBAGEGARBAGE"))
    assert len(recs) == 1
    # mid-member corruption: flip bytes inside a second member
    bad = bytearray(gzip.compress(_record(
        "response", "http://bad.example/", "2024-01-01T00:00:00Z",
        _http(200, "text/html", b"<html>bad</html>")), mtime=0))
    bad[15:19] = b"\x00\xff\x00\xff"
    recs = list(iter_warc_records(good + bytes(bad)))
    assert len(recs) == 1 and recs[0][0]["warc-target-uri"] == "http://ok.example/"
    # negative Content-Length: no phantom record, iteration stops
    neg = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -1\r\n\r\n\r\n\r\n"
        + _record("response", "http://after.example/", "2024-01-01T00:00:00Z",
                  _http(200, "text/html", b"x"))
    )
    assert list(iter_warc_records(neg)) == []


def test_malformed_warc_date_falls_back(spark, tmp_path):
    """A junk WARC-Date value must not fail the task — the row survives
    with the epoch fallback (framing corruption in the same file is
    tolerated, so header junk must be too)."""
    payload = _http(200, "text/html", b"<html>d</html>")
    rec = (
        f"WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: http://d.example/\r\nWARC-Date: unknown\r\n"
        f"Content-Length: {len(payload)}\r\n".encode()
        + CRLF + payload + CRLF + CRLF
    )
    p = tmp_path / "baddate.warc"
    p.write_bytes(rec)
    rows = read_warc(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0].warc_ts.isoformat() == "1970-01-01T00:00:00"


# -- sink + ranged scan ------------------------------------------------------


def test_write_warc_roundtrip(spark, tmp_path):
    import pandas as pd

    from dedupe_spark.sources.warc import write_warc

    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"http://site-{i}.example/p" for i in range(40)],
                "warc_ts": pd.to_datetime(
                    ["2024-05-01 00:00:00"] * 40
                ) + pd.to_timedelta(range(40), unit="s"),
                "html": [
                    f"<html><p>page {i} ✓ {'x' * (i * 37 % 300)}</p></html>".encode()
                    for i in range(40)
                ],
            }
        )
    ).repartition(3)
    out = str(tmp_path / "sunk")
    manifest = write_warc(pages, out).collect()
    files = sorted(r.file for r in manifest if r.n_records > 0)
    assert sum(r.n_records for r in manifest) == 40
    assert all(f.endswith(".warc.gz") for f in files)
    back = read_warc(spark, os.path.join(out, "*.warc.gz"))
    got = {r.url: (bytes(r.html), r.warc_ts, r.http_status) for r in back.collect()}
    src = {r.url: (bytes(r.html), r.warc_ts) for r in pages.collect()}
    assert len(got) == 40
    for url, (html, ts) in src.items():
        bhtml, bts, bstatus = got[url]
        assert bhtml == html  # byte-identical round trip
        assert bts == ts
        assert bstatus == 200


def test_write_warc_deterministic(spark, tmp_path):
    from dedupe_spark.sources.warc import write_warc

    import datetime

    one = spark.createDataFrame(
        [
            (
                "http://x.example/",
                datetime.datetime(2024, 1, 2, 3, 4, 5),
                b"<html>1</html>",
            )
        ],
        "url string, warc_ts timestamp, html binary",
    ).coalesce(1)
    # empty partitions produce no archive files, just empty manifest rows
    assert write_warc(one.where("url IS NULL"), str(tmp_path / "e")).where(
        "n_records > 0"
    ).count() == 0
    # same partition, same rows → same bytes
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    from dedupe_spark.sources.warc import write_warc as ww

    ww(one, a).collect()
    ww(one, b).collect()
    fa = open(os.path.join(a, "part-00000.warc.gz"), "rb").read()
    fb = open(os.path.join(b, "part-00000.warc.gz"), "rb").read()
    assert fa == fb and len(fa) > 0


def test_ranged_scan_equals_file_scan(spark, tmp_path):
    """Split-aware scan: every split size — including splits smaller
    than one member and landing mid-member — yields exactly the
    file-granular scan's rows (disjoint + exhaustive range contract)."""
    import pandas as pd

    from dedupe_spark.sources.warc import write_warc

    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"http://r.example/{i}" for i in range(120)],
                "warc_ts": pd.to_datetime(["2024-06-01"] * 120),
                "html": [
                    (f"<html>{i}:" + "pad" * (i * 13 % 250) + "</html>").encode()
                    for i in range(120)
                ],
            }
        )
    ).coalesce(1)  # ONE monolithic multi-member archive
    out = str(tmp_path / "mono")
    write_warc(pages, out).collect()
    arch = os.path.join(out, "part-00000.warc.gz")
    size = os.path.getsize(arch)
    baseline = sorted(
        (r.url, bytes(r.html)) for r in read_warc(spark, arch).collect()
    )
    assert len(baseline) == 120
    for split in (200, 1 << 12, size + 10):
        got = sorted(
            (r.url, bytes(r.html))
            for r in read_warc(spark, arch, split_bytes=split).collect()
        )
        assert got == baseline, f"split={split}"
    # ranged scan also accepts globs over multiple archives
    got = read_warc(
        spark, os.path.join(out, "*.warc.gz"), split_bytes=1 << 12
    ).count()
    assert got == 120


def test_write_warc_resinks_read_output_and_subsecond_ts(spark, tmp_path):
    """read_warc output is directly re-sinkable: NULL http_status /
    content_type (non-HTTP payload) fall back to 200/text/html, and
    sub-second warc_ts survives the round trip at microsecond
    precision."""
    import datetime

    from dedupe_spark.sources.warc import write_warc

    # archive with a non-HTTP response payload → status/ctype NULL
    raw = _record(
        "response", "http://raw.example/", "2024-03-03T03:00:00Z",
        b"not an http response at all",
    )
    p = tmp_path / "raw.warc"
    p.write_bytes(raw)
    back = read_warc(spark, str(p))
    assert back.collect()[0].http_status is None
    out1 = str(tmp_path / "resunk")
    m = write_warc(back, out1).collect()  # must not raise on NULL status
    assert sum(r.n_records for r in m) == 1
    again = read_warc(spark, os.path.join(out1, "*.warc.gz")).collect()[0]
    assert again.http_status == 200 and again.content_type == "text/html"
    assert bytes(again.html) == b"not an http response at all"

    # microsecond timestamp round trip
    sub = spark.createDataFrame(
        [("http://us.example/", datetime.datetime(2024, 5, 1, 0, 0, 0, 123456),
          b"<html>us</html>")],
        "url string, warc_ts timestamp, html binary",
    ).coalesce(1)
    out2 = str(tmp_path / "subsec")
    write_warc(sub, out2).collect()
    r = read_warc(spark, os.path.join(out2, "*.warc.gz")).collect()[0]
    assert r.warc_ts == datetime.datetime(2024, 5, 1, 0, 0, 0, 123456)


def test_ranged_scan_plain_warc(spark, warc_dir):
    """A plain (uncompressed) .warc routed through the ranged scanner
    parses via the start-0 whole-file fallback instead of raising —
    including when splits are smaller than the file."""
    p = os.path.join(warc_dir, "seg-00000.warc")
    base = sorted(r.url for r in read_warc(spark, p).collect())
    for split in (100, 1 << 20):
        got = sorted(
            r.url for r in read_warc(spark, p, split_bytes=split).collect()
        )
        assert got == base
    # mixed glob: plain + gz through the same ranged scan
    got = read_warc(
        spark, os.path.join(warc_dir, "*.warc*"), split_bytes=150
    ).count()
    assert got == 6


def test_warc_to_text_front(spark, warc_dir):
    """Archive → pages table → html-to-text ingest: the full crawl front."""
    pages = warc_pages(spark, os.path.join(warc_dir, "*.warc*"))
    filled = fill_text_from_html(pages, "builtin")
    got = {r.url: r.text for r in filled.collect()}
    assert "alpha page" in got["http://a.example/x"]
    assert "beta body" in got["http://b.example/y"]
