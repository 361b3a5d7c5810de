"""Pure-python/numpy BASELINE JPEG decoder (ITU-T T.81 sequential DCT,
Huffman, 8-bit): marker parse, canonical Huffman decode with byte
destuffing and restart markers, dequant + zigzag, exact float IDCT via
the 8x8 DCT-basis matmul, chroma upsampling and JFIF YCbCr->RGB.

Kept in its own module (not codecs.py) because it is an order of
magnitude more code than the container decoders; same contract —
:class:`~dedupe_spark.functions.codecs.CodecError` on anything
malformed or out of the baseline profile (progressive SOF2,
arithmetic coding, 12-bit precision and hierarchical modes raise, never
misdecode). Performance note: the Huffman bit loop is Python-speed —
fine for the mapInPandas feature path on thumbnails/test fixtures; a
production cluster swaps in libjpeg-turbo via PIL with the same Spark
plumbing (see operators/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecError, UnsupportedCodecFeature

__all__ = ["decode_jpeg"]

# zigzag scan order: ZIGZAG[i] = natural (row-major) index of the i-th
# coefficient in scan order
ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
       17, 24, 32, 25, 18, 11,  4,  5,
       12, 19, 26, 33, 40, 48, 41, 34,
       27, 20, 13,  6,  7, 14, 21, 28,
       35, 42, 49, 56, 57, 50, 43, 36,
       29, 22, 15, 23, 30, 37, 44, 51,
       58, 59, 52, 45, 38, 31, 39, 46,
       53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8-point DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
# spatial = A.T @ coeffs @ A  (the exact float IDCT, no integer approx)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


class _Huffman:
    """Canonical Huffman table from the DHT (counts-per-length, symbols)
    wire format; decode is a (length, code)-keyed dict walk."""

    def __init__(self, counts: bytes, symbols: bytes):
        if len(counts) != 16 or len(symbols) != sum(counts):
            raise CodecError("malformed DHT")
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lut[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 destuffing, stops at markers;
    RST alignment is handled by the caller via :meth:`restart`."""

    def __init__(self, b: bytes, pos: int):
        self.b = b
        self.pos = pos
        self.buf = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.b
        while self.n <= 24:
            if self.pos >= len(b):
                raise CodecError("truncated JPEG entropy data")
            byte = b[self.pos]
            if byte == 0xFF:
                nxt = b[self.pos + 1] if self.pos + 1 < len(b) else None
                if nxt == 0x00:  # stuffed literal FF
                    self.pos += 2
                elif nxt is None:
                    raise CodecError("truncated JPEG entropy data")
                else:  # a real marker: pad with zero bits (spec behaviour)
                    self.buf = (self.buf << 8) & 0xFFFFFFFF
                    self.n += 8
                    continue
                byte = 0xFF
            else:
                self.pos += 1
            self.buf = ((self.buf << 8) | byte) & 0xFFFFFFFF
            self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _Huffman) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lut.get((ln, code))
            if sym is not None:
                return sym
        raise CodecError("invalid JPEG Huffman code")

    def restart(self, idx: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.buf = 0
        self.n = 0
        b = self.b
        # skip to the marker (tolerate fill bytes, incl. runs of 0xFF:
        # T.81 B.1.1.2 allows any number of FF fill bytes before a marker)
        while self.pos + 1 < len(b) and not (
            b[self.pos] == 0xFF
            and b[self.pos + 1] != 0x00
            and b[self.pos + 1] != 0xFF
        ):
            self.pos += 1
        if self.pos + 1 >= len(b):
            raise CodecError("missing JPEG restart marker")
        m = b[self.pos + 1]
        if m != 0xD0 + (idx & 7):
            raise CodecError(f"unexpected marker 0x{m:02x} at restart")
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Error contract: malformed/truncated bytes raise CodecError, valid
    out-of-profile files raise UnsupportedCodecFeature — NEVER a bare
    ValueError/IndexError/KeyError (decode_media_features catches only
    the codec types; anything else would kill the whole Spark task)."""
    try:
        return _decode_jpeg_inner(b)
    except CodecError:
        raise
    except (ValueError, IndexError, KeyError, OverflowError) as e:
        raise CodecError(f"malformed JPEG: {e}") from e


def _decode_jpeg_inner(b: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB (or (h, w, 1) grayscale) from a BASELINE
    sequential Huffman JPEG. Supports 1- and 3-component scans, any
    integer sampling factors up to 4 (4:4:4 / 4:2:2 / 4:2:0 ...), and
    DRI/RSTn restart intervals."""
    if not b or b[:2] != b"\xff\xd8":
        raise CodecError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], _Huffman] = {}
    sof = None
    restart_interval = 0
    pos = 2
    try:
        while True:
            if pos + 4 > len(b):
                raise CodecError("truncated JPEG before SOS")
            if b[pos] != 0xFF:
                raise CodecError("JPEG marker desync")
            m = b[pos + 1]
            if m == 0xFF:  # fill byte
                pos += 1
                continue
            if m == 0xD9:
                raise CodecError("JPEG EOI before scan data")
            (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
            seg = b[pos + 4 : pos + 2 + seglen]
            if len(seg) != seglen - 2:
                raise CodecError("truncated JPEG segment")
            if m == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 15
                    if pq != 0:
                        raise UnsupportedCodecFeature("16-bit quant tables")
                    tbl = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.float64)
                    nat = np.empty(64)
                    nat[ZIGZAG] = tbl
                    qt[tq] = nat.reshape(8, 8)
                    p += 65
            elif m in (0xC0, 0xC1):  # SOF0/1: baseline / extended sequential
                prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
                if prec != 8:
                    raise UnsupportedCodecFeature("only 8-bit JPEG supported")
                if nc not in (1, 3):
                    raise CodecError(f"unsupported component count {nc}")
                comps = []
                for i in range(nc):
                    cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                    comps.append((cid, hv >> 4, hv & 15, tq))
                sof = (h, w, comps)
            elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise UnsupportedCodecFeature(
                    "non-baseline JPEG (progressive/arithmetic) unsupported"
                )
            elif m == 0xC4:  # DHT
                p = 0
                while p < len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 15
                    counts = seg[p + 1 : p + 17]
                    n = sum(counts)
                    hts[(tc, th)] = _Huffman(counts, seg[p + 17 : p + 17 + n])
                    p += 17 + n
            elif m == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", seg[:2])
            elif m == 0xDA:  # SOS — entropy data follows
                break
            pos += 2 + seglen
    except struct.error as e:
        raise CodecError(f"malformed JPEG: {e}") from e
    if sof is None:
        raise CodecError("JPEG missing SOF0")
    h, w, comps = sof
    if h <= 0 or w <= 0 or h * w > 64_000_000:
        raise CodecError("implausible JPEG dimensions")
    ns = seg[0]
    if ns != len(comps):
        raise CodecError("JPEG multi-scan files unsupported (baseline only)")
    scan = {}
    for i in range(ns):
        cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
        scan[cs] = (tt >> 4, tt & 15)
    data_pos = pos + 2 + seglen

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise CodecError("bad JPEG sampling factors")
    for _cid, c_h, c_v, _tq in comps:
        if c_h < 1 or c_v < 1 or hmax % c_h or vmax % c_v:
            # legal per T.81 but the integer-repeat upsampler can't
            # reproduce it -> deterministic-fake path, not a crash
            raise UnsupportedCodecFeature(
                f"non-divisor JPEG sampling {c_h}x{c_v} vs {hmax}x{vmax}"
            )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for cid, ch, cv, tq in comps:
        if tq not in qt:
            raise CodecError("JPEG references missing quant table")
        if cid not in scan:
            raise CodecError("scan/frame component mismatch")
        planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8)))

    r = _BitReader(b, data_pos)
    preds = [0] * len(comps)
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and (my * mcux + mx) and (my * mcux + mx) % restart_interval == 0:
                r.restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                tdc, tac = scan[cid]
                hdc, hac = hts.get((0, tdc)), hts.get((1, tac))
                if hdc is None or hac is None:
                    raise CodecError("JPEG references missing Huffman table")
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64)
                        s = r.huff(hdc)
                        if s > 11:
                            raise CodecError("bad JPEG DC size")
                        preds[ci] += _extend(r.bits(s), s)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = r.huff(hac)
                            run, size = rs >> 4, rs & 15
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise CodecError("JPEG AC index overflow")
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        coef = np.empty(64)
                        coef[ZIGZAG] = zz
                        block = _idct2(coef.reshape(8, 8) * qt[tq]) + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample chroma to the luma grid, crop to (h, w)
    full = []
    for (cid, ch, cv, tq), pl in zip(comps, planes):
        if ch != hmax or cv != vmax:
            pl = np.repeat(np.repeat(pl, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(pl[:h, :w])
    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return px[:, :, None]
    y, cb, cr = full
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    px = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.round(px), 0, 255).astype(np.uint8)
