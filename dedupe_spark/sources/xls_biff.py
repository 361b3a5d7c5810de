"""Legacy ``.xls`` (BIFF8) ingest — pure-stdlib reader.

The reference's upload allowlist admits ``.xls`` (backend/main.py:86-91)
but until now this engine rejected it with a re-save message (the
round-2-sanctioned fallback). This module closes that parity gap with a
from-scratch reader for the two PUBLIC formats involved:

- **MS-CFB** (Compound File Binary, the OLE2 container): 512-byte header,
  DIFAT -> FAT sector chains, directory entries, and the mini-FAT /
  mini-stream for streams under the 4096-byte cutoff — small real-world
  workbooks (xlwt, old Excel) store their ``Workbook`` stream there.
- **MS-XLS** (BIFF8 records inside the ``Workbook``/``Book`` stream):
  globals substream (SST shared strings with CONTINUE-spanning strings,
  BOUNDSHEET sheet directory) and the first worksheet substream's cell
  records (LABELSST, LABEL/RSTRING, NUMBER, RK, MULRK, BOOLERR, FORMULA
  with cached string/number/bool/error results, BLANK/MULBLANK).

Scope (documented, same all-string model as the .xlsx path, §1.2):
numbers come back as their stored value rendered as a decimal string
(date *styling* is not resolved), booleans as TRUE/FALSE, errors as
their #NAME? style literals. BIFF5/7 (the pre-unicode generation) is
detected and rejected with a clear message rather than misparsed.

Driver-side by design, like the .xlsx reader: Excel has no distributed
reader; ``excel_to_parquet`` is the handoff to the distributed plan.
"""

from __future__ import annotations

import math
import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF

# BIFF record ids (MS-XLS §2.3)
_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_LABELSST = 0x00FD
_LABEL = 0x0204
_RSTRING = 0x00D6
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_FORMULA_OLD = 0x0406  # BIFF3/4 id still emitted by some writers
_STRING = 0x0207

_BIFF_ERRORS = {
    0x00: "#NULL!", 0x07: "#DIV/0!", 0x0F: "#VALUE!", 0x17: "#REF!",
    0x1D: "#NAME?", 0x24: "#NUM!", 0x2A: "#N/A", 0x2B: "#GETTING_DATA",
}


# ---------------------------------------------------------------------------
# CFB container
# ---------------------------------------------------------------------------

def _read_cfb_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Return the bytes of the first directory stream whose name matches
    one of ``names`` (case-insensitive). Raises ValueError if absent."""
    if data[:8] != CFB_MAGIC:
        raise ValueError("not a CFB/OLE2 file")
    (sector_shift,) = struct.unpack_from("<H", data, 30)
    (mini_shift,) = struct.unpack_from("<H", data, 32)
    (first_dir,) = struct.unpack_from("<I", data, 48)
    (mini_cutoff,) = struct.unpack_from("<I", data, 56)
    (first_minifat,) = struct.unpack_from("<I", data, 60)
    (n_minifat,) = struct.unpack_from("<I", data, 64)
    (first_difat,) = struct.unpack_from("<I", data, 68)
    (n_difat,) = struct.unpack_from("<I", data, 72)
    ssz = 1 << sector_shift  # 512 (v3) or 4096 (v4); header padded in v4
    msz = 1 << mini_shift

    def sector(n: int) -> bytes:
        off = (n + 1) * ssz
        return data[off : off + ssz]

    # DIFAT: 109 FAT sector numbers in the header, then chained DIFAT sectors
    fat_sectors = list(struct.unpack_from("<109I", data, 76))
    nxt = first_difat
    per = ssz // 4 - 1
    for _ in range(n_difat):
        if nxt in (_ENDOFCHAIN, _FREESECT):
            break
        raw = struct.unpack(f"<{per + 1}I", sector(nxt))
        fat_sectors.extend(raw[:per])
        nxt = raw[-1]
    fat: list[int] = []
    for s in fat_sectors:
        if s in (_ENDOFCHAIN, _FREESECT):
            continue
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(s)))

    def chain(start: int, size: int | None = None) -> bytes:
        out, s, guard = bytearray(), start, len(fat) + 2
        while s not in (_ENDOFCHAIN, _FREESECT) and guard:
            out += sector(s)
            s = fat[s] if s < len(fat) else _ENDOFCHAIN
            guard -= 1
        return bytes(out[:size]) if size is not None else bytes(out)

    # directory entries: 128 bytes each across the directory chain
    dir_raw = chain(first_dir)
    entries = []
    for off in range(0, len(dir_raw) - 127, 128):
        (name_len,) = struct.unpack_from("<H", dir_raw, off + 64)
        if not 2 <= name_len <= 64:
            continue
        name = dir_raw[off : off + name_len - 2].decode("utf-16-le", "replace")
        otype = dir_raw[off + 66]
        (start,) = struct.unpack_from("<I", dir_raw, off + 116)
        (size,) = struct.unpack_from("<Q", dir_raw, off + 120)
        if ssz == 512:
            size &= 0xFFFFFFFF  # v3: only the low 32 bits are valid
        entries.append((name, otype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    target = next(
        (e for e in entries if e[1] == 2 and e[0].casefold() in
         tuple(n.casefold() for n in names)),
        None,
    )
    if target is None:
        raise ValueError(f"CFB file has no {'/'.join(names)} stream")
    _, _, start, size = target

    if size >= mini_cutoff or root is None:
        return chain(start, size)

    # mini stream: bytes live in the ROOT entry's regular chain, addressed
    # in mini-sector units via the mini-FAT chain
    ministream = chain(root[2], root[3])
    minifat: list[int] = []
    nxt = first_minifat
    for _ in range(n_minifat):
        if nxt in (_ENDOFCHAIN, _FREESECT):
            break
        minifat.extend(struct.unpack(f"<{ssz // 4}I", sector(nxt)))
        nxt = fat[nxt] if nxt < len(fat) else _ENDOFCHAIN
    out, s, guard = bytearray(), start, len(minifat) + 2
    while s not in (_ENDOFCHAIN, _FREESECT) and guard:
        out += ministream[s * msz : (s + 1) * msz]
        s = minifat[s] if s < len(minifat) else _ENDOFCHAIN
        guard -= 1
    return bytes(out[:size])


# ---------------------------------------------------------------------------
# BIFF8 record stream
# ---------------------------------------------------------------------------

class _Records:
    """Sequential record walker over a BIFF stream."""

    def __init__(self, stream: bytes, pos: int = 0):
        self.stream = stream
        self.pos = pos

    def next(self) -> tuple[int, bytes] | None:
        if self.pos + 4 > len(self.stream):
            return None
        rtype, rlen = struct.unpack_from("<HH", self.stream, self.pos)
        data = self.stream[self.pos + 4 : self.pos + 4 + rlen]
        self.pos += 4 + rlen
        return rtype, data


class _ChunkReader:
    """Reader over [record, CONTINUE, ...] payloads for CONTINUE-spanning
    structures (the SST). Fixed-width fields read across chunk boundaries
    transparently; *string character data* crossing into a CONTINUE must
    re-read a fresh option-flags byte (MS-XLS §2.5.293) — ``read_chars``
    handles that."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.off = 0

    def _avail(self) -> int:
        return len(self.chunks[self.ci]) - self.off

    def _advance(self) -> bool:
        while self.ci + 1 < len(self.chunks):
            self.ci += 1
            self.off = 0
            if self._avail():
                return True
        return False

    def exhausted(self) -> bool:
        if self._avail():
            return False
        return not any(self.chunks[i] for i in range(self.ci + 1, len(self.chunks)))

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n:
            if not self._avail():
                if not self._advance():
                    raise ValueError("truncated BIFF structure")
                continue
            take = min(n, self._avail())
            out += self.chunks[self.ci][self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def u8(self) -> int:
        return self.read(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.read(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.read(4))[0]

    def read_chars(self, cch: int, high: bool) -> str:
        """cch characters, re-reading the grbit byte at each chunk
        boundary crossed mid-character-data (the continuation may switch
        between compressed and UTF-16 encodings)."""
        parts: list[str] = []
        while cch:
            if not self._avail():
                if not self._advance():
                    raise ValueError("truncated BIFF string")
                high = bool(self.u8() & 0x01)
                continue
            width = 2 if high else 1
            n = min(cch, self._avail() // width)
            if n == 0:
                # a UTF-16 char split across chunks is spec-illegal; be
                # lenient and stitch the two halves
                raw = self.read(width)
                parts.append(raw.decode("utf-16-le", "replace"))
                cch -= 1
                continue
            raw = self.read(n * width)
            parts.append(raw.decode("utf-16-le" if high else "latin-1"))
            cch -= n
        return "".join(parts)


def _read_unicode_string(r: _ChunkReader, cch_len: int = 2) -> str:
    """XLUnicodeRichExtendedString (cch_len=2) / ShortXLUnicodeString
    (cch_len=1), MS-XLS §2.5.293/.240."""
    cch = r.u16() if cch_len == 2 else r.u8()
    grbit = r.u8()
    high = bool(grbit & 0x01)
    c_run = r.u16() if grbit & 0x08 else 0
    cb_ext = r.u32() if grbit & 0x04 else 0
    s = r.read_chars(cch, high)
    if c_run:
        r.read(4 * c_run)  # rich formatting runs — presentation only
    if cb_ext:
        r.read(cb_ext)  # ExtRst (phonetic) — reading aid, not the text
    return s


def _parse_sst(chunks: list[bytes]) -> list[str]:
    r = _ChunkReader(chunks)
    r.u32()  # cstTotal (with repeats)
    cst_unique = r.u32()
    out: list[str] = []
    for _ in range(cst_unique):
        if r.exhausted():
            break
        out.append(_read_unicode_string(r))
    return out


def _fmt_num(d: float) -> str:
    """Stored numeric -> decimal string, matching the .xlsx reader's
    raw-<v>-text behavior (integers without a trailing .0)."""
    # is_integer() is False for nan/inf — `int(d)` would raise
    # OverflowError/ValueError instead of the module's ValueError contract
    if math.isfinite(d) and d.is_integer() and abs(d) < 2**53:
        return str(int(d))
    return repr(d)


def _decode_rk(rk: int) -> str:
    if rk & 0x02:  # fInt: signed 30-bit integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        num = float(v)
    else:  # top 30 bits of an IEEE double
        num = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    if rk & 0x01:  # fX100
        num /= 100.0
    return _fmt_num(num)


def read_xls_rows(path: str) -> list[list[str | None]]:
    """First worksheet of a BIFF8 ``.xls`` -> rows of cell strings
    (None = absent cell). The ``.xls`` twin of ``read_xlsx_rows``.

    Error contract: ANY malformed/truncated container or record raises
    ValueError (struct.error/IndexError/OverflowError from crafted bytes
    are normalized here, so excel ingest's error handling sees one
    exception type)."""
    try:
        return _read_xls_rows_inner(path)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as e:
        raise ValueError(f"{path!r}: corrupt .xls ({e})") from e


def _read_xls_rows_inner(path: str) -> list[list[str | None]]:
    with open(path, "rb") as fh:
        data = fh.read()
    stream = _read_cfb_stream(data, ("Workbook", "Book"))

    # -- globals substream: version check, BOUNDSHEET directory, SST
    recs = _Records(stream)
    first = recs.next()
    if first is None or first[0] != _BOF:
        raise ValueError(f"{path!r}: Workbook stream does not start with BOF")
    vers = struct.unpack_from("<H", first[1], 0)[0] if len(first[1]) >= 2 else 0
    if vers and vers != 0x0600:
        raise ValueError(
            f"{path!r}: BIFF version 0x{vers:04x} is pre-BIFF8 (Excel 5/95); "
            "only BIFF8 (Excel 97+) .xls is supported — re-save as .xlsx or CSV"
        )
    sheet_offsets: list[int] = []
    sst: list[str] = []
    while True:
        rec = recs.next()
        if rec is None or rec[0] == _EOF:
            break
        rtype, rdata = rec
        if rtype == _BOUNDSHEET:
            (lb_ply_pos,) = struct.unpack_from("<I", rdata, 0)
            hidden = rdata[4] & 0x03
            dt = rdata[5]  # 0 = worksheet
            if dt == 0 and hidden == 0:
                sheet_offsets.append(lb_ply_pos)
        elif rtype == _SST:
            chunks = [rdata]
            # CONTINUEs immediately follow their parent record
            probe = _Records(stream, recs.pos)
            while True:
                nxt = probe.next()
                if nxt is None or nxt[0] != _CONTINUE:
                    break
                chunks.append(nxt[1])
                recs.pos = probe.pos
            sst = _parse_sst(chunks)
    if not sheet_offsets:
        raise ValueError(f"{path!r}: no visible worksheet in workbook")

    # -- first worksheet substream
    cells: dict[tuple[int, int], str] = {}
    recs = _Records(stream, sheet_offsets[0])
    rec = recs.next()
    if rec is None or rec[0] != _BOF:
        raise ValueError(f"{path!r}: worksheet substream missing BOF")
    pending_formula: tuple[int, int] | None = None
    while True:
        rec = recs.next()
        if rec is None or rec[0] == _EOF:
            break
        rtype, rdata = rec
        if rtype == _LABELSST:
            rw, col, _ixfe, isst = struct.unpack_from("<HHHI", rdata, 0)
            if isst < len(sst):
                cells[(rw, col)] = sst[isst]
        elif rtype in (_LABEL, _RSTRING):
            rw, col, _ixfe = struct.unpack_from("<HHH", rdata, 0)
            cells[(rw, col)] = _read_unicode_string(_ChunkReader([rdata[6:]]))
        elif rtype == _NUMBER:
            rw, col, _ixfe = struct.unpack_from("<HHH", rdata, 0)
            (num,) = struct.unpack_from("<d", rdata, 6)
            cells[(rw, col)] = _fmt_num(num)
        elif rtype == _RK:
            rw, col, _ixfe, rk = struct.unpack_from("<HHHI", rdata, 0)
            cells[(rw, col)] = _decode_rk(rk)
        elif rtype == _MULRK:
            rw, col_first = struct.unpack_from("<HH", rdata, 0)
            n = (len(rdata) - 6) // 6
            for i in range(n):
                _ixfe, rk = struct.unpack_from("<HI", rdata, 4 + 6 * i)
                cells[(rw, col_first + i)] = _decode_rk(rk)
        elif rtype == _BOOLERR:
            rw, col, _ixfe, val, is_err = struct.unpack_from("<HHHBB", rdata, 0)
            if is_err:
                cells[(rw, col)] = _BIFF_ERRORS.get(val, f"#ERR{val:02X}")
            else:
                cells[(rw, col)] = "TRUE" if val else "FALSE"
        elif rtype in (_FORMULA, _FORMULA_OLD):
            rw, col, _ixfe = struct.unpack_from("<HHH", rdata, 0)
            result = rdata[6:14]
            if result[6:8] == b"\xff\xff":
                kind = result[0]
                if kind == 0:  # cached string arrives in the next STRING rec
                    pending_formula = (rw, col)
                elif kind == 1:
                    cells[(rw, col)] = "TRUE" if result[2] else "FALSE"
                elif kind == 2:
                    cells[(rw, col)] = _BIFF_ERRORS.get(
                        result[2], f"#ERR{result[2]:02X}"
                    )
                # kind 3 = cached empty string -> absent cell
            else:
                (num,) = struct.unpack("<d", result)
                cells[(rw, col)] = _fmt_num(num)
        elif rtype == _STRING and pending_formula is not None:
            cells[pending_formula] = _read_unicode_string(_ChunkReader([rdata]))
            pending_formula = None
        # BLANK / MULBLANK / DIMENSIONS / ROW / formatting: no cell value

    if not cells:
        return []
    n_rows = max(rw for rw, _ in cells) + 1
    width = max(c for _, c in cells) + 1
    return [
        [cells.get((rw, c)) for c in range(width)] for rw in range(n_rows)
    ]
