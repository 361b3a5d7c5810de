"""Legacy .xls (BIFF8/CFB) reader tests — S2 parity (reference
backend/main.py:86-91 admits .xls on upload).

No .xls sample exists in the reference and no xlwt/openpyxl is installed,
so these tests carry their own minimal BIFF8 writer: a CFB container
(regular-FAT and mini-stream variants) around a Workbook stream with the
cell-record zoo the reader supports — including an SST string split
across a CONTINUE record mid-characters with an encoding switch, the
format's nastiest corner.
"""

from __future__ import annotations

import struct

import pytest

FREE = 0xFFFFFFFF
END = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


# ---------------------------------------------------------------------------
# minimal CFB writer (MS-CFB v3, 512-byte sectors)
# ---------------------------------------------------------------------------

def _dir_entry(name: str, otype: int, start: int, size: int,
               child: int = FREE) -> bytes:
    raw_name = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[0 : len(raw_name)] = raw_name
    struct.pack_into("<H", e, 64, len(raw_name))
    e[66] = otype
    e[67] = 1  # black
    struct.pack_into("<III", e, 68, FREE, FREE, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def _cfb_header(n_fat: int, first_dir: int, first_minifat: int,
                n_minifat: int) -> bytes:
    h = bytearray(512)
    h[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", h, 24, 0x003E)  # minor
    struct.pack_into("<H", h, 26, 0x0003)  # major (v3)
    struct.pack_into("<H", h, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", h, 30, 9)       # 512-byte sectors
    struct.pack_into("<H", h, 32, 6)       # 64-byte mini sectors
    struct.pack_into("<I", h, 44, n_fat)
    struct.pack_into("<I", h, 48, first_dir)
    struct.pack_into("<I", h, 56, 4096)    # mini cutoff
    struct.pack_into("<I", h, 60, first_minifat)
    struct.pack_into("<I", h, 64, n_minifat)
    struct.pack_into("<I", h, 68, END)     # no DIFAT chain
    struct.pack_into("<I", h, 72, 0)
    difat = [0] + [FREE] * 108             # FAT lives in sector 0
    struct.pack_into("<109I", h, 76, *difat)
    return bytes(h)


def _pad(b: bytes, unit: int) -> bytes:
    return b + b"\x00" * (-len(b) % unit)


def write_cfb(path: str, stream: bytes, stream_name: str = "Workbook",
              force_mini: bool = False) -> None:
    """One-stream CFB file. Streams >= 4096 bytes (or padded there) use the
    regular FAT; force_mini keeps a small stream in the mini stream,
    exercising the reader's mini-FAT path."""
    if not force_mini and len(stream) < 4096:
        # regular-FAT variant: spec stores small streams in the mini
        # stream, so grow past the cutoff (zero tail after EOF is inert)
        stream = _pad(stream, 4096)
    if force_mini:
        assert len(stream) < 4096
        ministream = _pad(stream, 64)
        n_mini = len(ministream) // 64
        minifat = [i + 1 for i in range(n_mini - 1)] + [END]
        minifat_sec = _pad(struct.pack(f"<{n_mini}I", *minifat), 512)
        mini_secs = _pad(ministream, 512)
        n_ms = len(mini_secs) // 512
        # sectors: 0 FAT, 1 dir, 2 miniFAT, 3.. ministream
        fat = [FATSECT, END, END]
        fat += [3 + i + 1 for i in range(n_ms - 1)] + [END]
        fat_sec = _pad(struct.pack(f"<{len(fat)}I", *fat) +
                       struct.pack("<I", FREE) * (128 - len(fat)), 512)
        root = _dir_entry("Root Entry", 5, 3, len(ministream), child=1)
        entry = _dir_entry(stream_name, 2, 0, len(stream))
        dir_sec = _pad(root + entry, 512)
        body = fat_sec + dir_sec + minifat_sec + mini_secs
        header = _cfb_header(1, first_dir=1, first_minifat=2, n_minifat=1)
    else:
        data_secs = _pad(stream, 512)
        n_data = len(data_secs) // 512
        fat = [FATSECT, END]  # FAT itself, directory
        fat += [2 + i + 1 for i in range(n_data - 1)] + [END]
        assert len(fat) <= 128, "test fixture exceeds one FAT sector"
        fat_sec = _pad(struct.pack(f"<{len(fat)}I", *fat) +
                       struct.pack("<I", FREE) * (128 - len(fat)), 512)
        root = _dir_entry("Root Entry", 5, END, 0, child=1)
        entry = _dir_entry(stream_name, 2, 2, len(stream))
        dir_sec = _pad(root + entry, 512)
        body = fat_sec + dir_sec + data_secs
        header = _cfb_header(1, first_dir=1, first_minifat=END, n_minifat=0)
    with open(path, "wb") as fh:
        fh.write(header + body)


# ---------------------------------------------------------------------------
# minimal BIFF8 Workbook stream writer
# ---------------------------------------------------------------------------

def _rec(rtype: int, data: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(data)) + data


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def _ustr(s: str) -> bytes:
    """XLUnicodeRichExtendedString, auto compressed/utf-16."""
    if all(ord(c) < 256 for c in s):
        return struct.pack("<HB", len(s), 0) + s.encode("latin-1")
    return struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")


def _short_ustr(s: str) -> bytes:
    return struct.pack("<BB", len(s), 0) + s.encode("latin-1")


def _rk_int(v: int, x100: bool = False) -> int:
    return ((v & 0x3FFFFFFF) << 2) | (0x01 if x100 else 0) | 0x02


def _rk_dbl(d: float) -> int:
    (bits,) = struct.unpack("<Q", struct.pack("<d", d))
    assert bits & 0x3FFFFFFFF == 0, "not RK-double encodable"
    return (bits >> 32) & 0xFFFFFFFC


SST_STRINGS = ["name", "score", "flag", "note", "continued-across-記録"]


def _sst_records() -> bytes:
    """SST whose last string's characters split into a CONTINUE record,
    switching from the SST chunk's utf-16 to... the continuation re-declares
    its own encoding via a fresh grbit byte (MS-XLS §2.5.293)."""
    body = struct.pack("<II", len(SST_STRINGS), len(SST_STRINGS))
    for s in SST_STRINGS[:-1]:
        body += _ustr(s)
    last = SST_STRINGS[-1]  # has a non-latin char -> utf-16
    split = 10  # chars in the SST record, remainder in the CONTINUE
    body += struct.pack("<HB", len(last), 1) + last[:split].encode("utf-16-le")
    cont = struct.pack("<B", 1) + last[split:].encode("utf-16-le")
    return _rec(0x00FC, body) + _rec(0x003C, cont)


def _cell(rtype: int, rw: int, col: int, payload: bytes) -> bytes:
    return _rec(rtype, struct.pack("<HHH", rw, col, 0) + payload)


def build_workbook_stream() -> bytes:
    """Two-sheet workbook: sheet0 HIDDEN (decoy cells), sheet1 visible with
    every supported cell record type."""
    decoy = _bof(0x0010) + _cell(0x0203, 0, 0, struct.pack("<d", 666.0)) \
        + _rec(0x000A, b"")
    sheet = _bof(0x0010)
    # row 0: headers via LABELSST
    for c in range(4):
        sheet += _rec(0x00FD, struct.pack("<HHHI", 0, c, 0, c))
    # row 1: split-SST string, NUMBER, RK int, BOOLERR true
    sheet += _rec(0x00FD, struct.pack("<HHHI", 1, 0, 0, 4))
    sheet += _cell(0x0203, 1, 1, struct.pack("<d", 2.5))
    sheet += _rec(0x027E, struct.pack("<HHHI", 1, 2, 0, _rk_int(300)))
    sheet += _cell(0x0205, 1, 3, bytes([1, 0]))
    # row 2: inline LABEL, MULRK (x100 int + double), BOOLERR #N/A
    sheet += _cell(0x0204, 2, 0, _ustr("inline-label"))
    mulrk = struct.pack("<HH", 2, 1) \
        + struct.pack("<HI", 0, _rk_int(125, x100=True)) \
        + struct.pack("<HI", 0, _rk_dbl(1.5)) + struct.pack("<H", 2)
    sheet += _rec(0x00BD, mulrk)
    sheet += _cell(0x0205, 2, 3, bytes([0x2A, 1]))
    # row 3: FORMULA cached number, FORMULA cached string + STRING, blank col
    sheet += _cell(0x0006, 3, 0, struct.pack("<d", 42.0) + b"\x00\x00\x00\x00\x00\x00")
    sheet += _cell(
        0x0006, 3, 1,
        bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF]) + b"\x00\x00\x00\x00\x00\x00",
    )
    sheet += _rec(0x0207, _ustr("cached-str"))
    sheet += _rec(0x0201, struct.pack("<HHH", 3, 2, 0))  # BLANK -> absent
    sheet += _cell(0x0205, 3, 3, bytes([0, 0]))
    sheet += _rec(0x000A, b"")

    # globals: BOF, 2x BOUNDSHEET (needs sheet offsets -> placeholder pass)
    def globals_block(off0: int, off1: int) -> bytes:
        g = _bof(0x0005)
        g += _rec(0x0085, struct.pack("<IBB", off0, 0x01, 0) + _short_ustr("Hidden"))
        g += _rec(0x0085, struct.pack("<IBB", off1, 0x00, 0) + _short_ustr("Data"))
        g += _sst_records()
        g += _rec(0x000A, b"")
        return g

    glen = len(globals_block(0, 0))
    return globals_block(glen, glen + len(decoy)) + decoy + sheet


EXPECTED_GRID = [
    ["name", "score", "flag", "note"],
    ["continued-across-記録", "2.5", "300", "TRUE"],
    ["inline-label", "1.25", "1.5", "#N/A"],
    ["42", "cached-str", None, "FALSE"],
]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_read_xls_regular_fat(tmp_path):
    from dedupe_spark.sources.xls_biff import read_xls_rows

    p = str(tmp_path / "fixture.xls")
    write_cfb(p, build_workbook_stream())
    assert read_xls_rows(p) == EXPECTED_GRID


def test_read_xls_mini_stream(tmp_path):
    """Small real-world workbooks store the Workbook stream under the
    4096-byte cutoff in the mini stream — same grid either way."""
    from dedupe_spark.sources.xls_biff import read_xls_rows

    stream = build_workbook_stream()
    assert len(stream) < 4096, "mini-stream fixture must stay under cutoff"
    p = str(tmp_path / "mini.xls")
    write_cfb(p, stream, force_mini=True)
    assert read_xls_rows(p) == EXPECTED_GRID


def test_read_xls_book_stream_name(tmp_path):
    """Excel 5/95-lineage files name the stream 'Book'; BIFF8 content under
    that name still parses."""
    from dedupe_spark.sources.xls_biff import read_xls_rows

    p = str(tmp_path / "book.xls")
    write_cfb(p, build_workbook_stream(), stream_name="Book")
    assert read_xls_rows(p) == EXPECTED_GRID


def test_read_excel_rows_dispatch(tmp_path):
    """read_excel_rows sniffs magic bytes: CFB -> BIFF parser, zip -> xlsx
    parser, junk -> the xlsx error."""
    from dedupe_spark.sources.ingest import read_excel_rows

    p = str(tmp_path / "fixture.xls")
    write_cfb(p, build_workbook_stream())
    assert read_excel_rows(p) == EXPECTED_GRID

    junk = str(tmp_path / "junk.xls")
    with open(junk, "wb") as fh:
        fh.write(b"not really excel at all")
    with pytest.raises(ValueError, match="not an .xlsx"):
        read_excel_rows(junk)


def test_read_excel_df_xls(spark, tmp_path):
    from dedupe_spark.sources.ingest import read_excel_df

    p = str(tmp_path / "fixture.xls")
    write_cfb(p, build_workbook_stream())
    df = read_excel_df(spark, p)
    assert df.columns == ["name", "score", "flag", "note", "source_file"]
    got = {r["name"]: r for r in df.collect()}
    assert got["inline-label"]["score"] == "1.25"
    assert got["continued-across-記録"]["flag"] == "300"
    assert got["42"]["flag"] is None  # BLANK cell
    assert all(r["source_file"] == "fixture.xls" for r in got.values())


def test_pre_biff8_rejected(tmp_path):
    from dedupe_spark.sources.xls_biff import read_xls_rows

    stream = _rec(0x0809, struct.pack("<HHHHII", 0x0500, 0x0005, 0, 0, 0, 0)) \
        + _rec(0x000A, b"")
    p = str(tmp_path / "old.xls")
    write_cfb(p, stream)
    with pytest.raises(ValueError, match="pre-BIFF8"):
        read_xls_rows(p)


def test_missing_workbook_stream(tmp_path):
    from dedupe_spark.sources.xls_biff import read_xls_rows

    p = str(tmp_path / "odd.xls")
    write_cfb(p, build_workbook_stream(), stream_name="NotAWorkbook")
    with pytest.raises(ValueError, match="no Workbook/Book stream"):
        read_xls_rows(p)
