"""Pure-stdlib media decoders: PNG, BMP, WAV and GIF are fully decodable
with zero codec dependencies (PNG's DEFLATE lives in CPython's zlib; BMP
and WAV-PCM are uncompressed; GIF's LZW is ~60 lines of bit arithmetic),
so their pixel/sample decode is REAL here — the NotImplementedError stub
in operators/multimodal.py now gates only formats that genuinely need an
external codec (WEBP/MP4); baseline JPEG decode lives in the sibling
functions/jpeg.py (from-scratch Huffman + DCT).

Decoders raise :class:`CodecError` on malformed or unsupported input —
never a bare struct/zlib error — so a mapInPandas stage can catch one
exception type per row and keep the batch alive (the untrusted-bytes
contract, same as multimodal.sniff_header).

Scale notes: these run inside Arrow-batched ``mapInPandas`` workers, one
row's bytes at a time; the per-row cost is the decode itself (the PNG
unfilter loop is O(pixels)). Production clusters with PIL/ffmpeg swap
the kernel body, not the Spark plumbing — schemas, batching and the
feature contract stay identical.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


class CodecError(ValueError):
    """Malformed or unsupported media bytes."""


class UnsupportedCodecFeature(CodecError):
    """VALID bytes outside the decoder's supported profile (e.g. an
    arithmetic-coded JPEG): route to the deterministic-fake feature
    path, not the malformed-bytes 'error' path."""


# ---------------------------------------------------------------------------
# PNG (spec: RFC 2083 / W3C PNG) — bit depth 8, non-interlaced;
# color types 0 gray, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(b: bytes) -> np.ndarray:
    """(h, w, channels) uint8 pixel array (palette expanded to RGB)."""
    if not b or b[:8] != _PNG_SIG:
        raise CodecError("not a PNG")
    pos, ihdr, plte, idat = 8, None, None, []
    try:
        while pos + 8 <= len(b):
            (clen,) = struct.unpack(">I", b[pos : pos + 4])
            ctype = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + clen]
            if len(data) != clen:
                raise CodecError("truncated chunk")
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"PLTE":
                if not clen or clen % 3:
                    raise CodecError("malformed PLTE length")
                plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + clen  # len + type + data + crc
    except struct.error as e:
        raise CodecError(f"malformed PNG: {e}") from e
    if ihdr is None or not idat:
        raise CodecError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        # 1/2/4/16 are VALID PNG — out of profile, not malformed
        raise UnsupportedCodecFeature(
            f"unsupported PNG bit depth {depth} (only 8)"
        )
    if interlace != 0:
        raise UnsupportedCodecFeature("interlaced PNG unsupported")
    if comp != 0 or filt != 0:
        raise CodecError("nonstandard PNG compression/filter method")
    if color == 3:
        if plte is None:
            raise CodecError("palette PNG without PLTE")
        ch = 1
    elif color in _PNG_CHANNELS:
        ch = _PNG_CHANNELS[color]
    else:
        raise CodecError(f"unknown PNG color type {color}")
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise CodecError("implausible PNG dimensions")
    stride = w * ch
    try:
        # bound the inflate: a 1x1 PNG whose IDAT expands to GBs must not
        # materialize past the expected payload (+1 so oversize is seen)
        limit = (stride + 1) * h + 1
        raw = zlib.decompressobj().decompress(b"".join(idat), limit)
    except zlib.error as e:
        raise CodecError(f"bad PNG stream: {e}") from e
    if len(raw) != (stride + 1) * h:
        raise CodecError("PNG payload size mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-sequential
            cur = np.zeros(stride, np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                if f == 1:
                    cur[x] = (row[x] + a) & 0xFF
                elif f == 3:
                    cur[x] = (row[x] + (a + prev[x]) // 2) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    cur[x] = (row[x] + _paeth(a, prev[x], c)) & 0xFF
        else:
            raise CodecError(f"unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, ch)
    if color == 3:
        idx = px[:, :, 0]
        if idx.max() >= len(plte):
            raise CodecError("palette index out of range")
        px = plte[idx]
    return px


# ---------------------------------------------------------------------------
# BMP — BITMAPINFOHEADER (40+), BI_RGB uncompressed, 24/32 bpp
# ---------------------------------------------------------------------------


def decode_bmp(b: bytes) -> np.ndarray:
    """(h, w, 3|4) uint8 RGB(A) array from an uncompressed BMP."""
    if not b or b[:2] != b"BM" or len(b) < 54:
        raise CodecError("not a BMP")
    try:
        (data_off,) = struct.unpack("<I", b[10:14])
        (hdr_size,) = struct.unpack("<I", b[14:18])
        w, h_signed = struct.unpack("<ii", b[18:26])
        planes, bpp = struct.unpack("<HH", b[26:30])
        (compression,) = struct.unpack("<I", b[30:34])
    except struct.error as e:
        raise CodecError(f"malformed BMP: {e}") from e
    if hdr_size < 40 or planes != 1:
        raise CodecError("unsupported BMP header")
    if compression != 0:
        # RLE/bitfield BMPs are valid — out of profile, not malformed
        raise UnsupportedCodecFeature("only BI_RGB (uncompressed) BMP supported")
    if bpp not in (24, 32):
        raise UnsupportedCodecFeature(f"unsupported BMP bpp {bpp} (only 24/32)")
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0 or w * h > 64_000_000:
        raise CodecError("implausible BMP dimensions")
    ch = bpp // 8
    stride = (w * ch + 3) & ~3  # rows padded to 4 bytes
    need = data_off + stride * h
    if len(b) < need:
        raise CodecError("truncated BMP pixel data")
    rows = np.frombuffer(b, np.uint8, stride * h, data_off).reshape(h, stride)
    px = rows[:, : w * ch].reshape(h, w, ch)
    if not top_down:
        px = px[::-1]
    # BGR(A) -> RGB(A)
    order = [2, 1, 0] + ([3] if ch == 4 else [])
    return np.ascontiguousarray(px[:, :, order])


# ---------------------------------------------------------------------------
# GIF (spec: GIF87a/89a) — first frame, global/local color table,
# interlace and GCE transparency handled; LZW is variable-width
# LSB-first codes, max 12 bits, CLEAR resets the table
# ---------------------------------------------------------------------------


def _gif_lzw(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Decode a GIF LZW stream to ``n_pixels`` palette indices."""
    if not 2 <= min_code_size <= 8:
        raise CodecError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(roots)
    width = min_code_size + 1
    out = bytearray()
    bitbuf = nbits = pos = 0
    prev = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise CodecError("truncated GIF LZW stream")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = list(roots)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise CodecError("bad first LZW code after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise CodecError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise CodecError("GIF pixel data ended early")
    return out[:n_pixels]


def _gif_subblocks(b: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (payload, position after the 0 terminator)."""
    chunks = []
    while True:
        if pos >= len(b):
            raise CodecError("unterminated GIF sub-blocks")
        n = b[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(b):
            raise CodecError("truncated GIF sub-block")
        chunks.append(b[pos : pos + n])
        pos += n


_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(b: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB of the FIRST frame composed onto the logical
    screen (background fill, GCE transparency respected). Animation
    beyond frame 1 is out of scope for feature extraction — frame
    sampling at scale decodes frames independently anyway."""
    if not b or b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        raise CodecError("not a GIF")
    w, h = struct.unpack("<HH", b[6:10])
    packed, bg = b[10], b[11]
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise CodecError("implausible GIF dimensions")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            raise CodecError("truncated GIF global color table")
        gct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    transparent = None
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise CodecError("GIF has no image data")
        if block == 0x21:  # extension
            if pos >= len(b):
                raise CodecError("truncated GIF extension")
            label = b[pos]
            payload, pos = _gif_subblocks(b, pos + 1)
            if label == 0xF9 and len(payload) >= 4 and payload[0] & 0x01:
                transparent = payload[3]
            continue
        if block != 0x2C:
            raise CodecError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(b):
            raise CodecError("truncated GIF image descriptor")
        left, top, fw, fh = struct.unpack("<HHHH", b[pos : pos + 8])
        ipacked = b[pos + 8]
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(b):
                raise CodecError("truncated GIF local color table")
            ct = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise CodecError("GIF image without any color table")
        if fw <= 0 or fh <= 0 or fw * fh > 64_000_000:
            raise CodecError("implausible GIF frame dimensions")
        if pos >= len(b):
            raise CodecError("missing GIF LZW code size")
        mcs = b[pos]
        data, pos = _gif_subblocks(b, pos + 1)
        idx = np.frombuffer(
            bytes(_gif_lzw(data, mcs, fw * fh)), np.uint8
        ).reshape(fh, fw)
        if ipacked & 0x40:  # interlaced: stream rows -> display rows
            order = [
                y for start, step in _GIF_INTERLACE for y in range(start, fh, step)
            ]
            deint = np.empty_like(idx)
            deint[order] = idx
            idx = deint
        if idx.max() >= len(ct):
            raise CodecError("GIF palette index out of range")
        # clip the frame rectangle to the logical screen and compose
        cw, ch_ = min(fw, w - left), min(fh, h - top)
        if cw <= 0 or ch_ <= 0:
            raise CodecError("GIF frame outside logical screen")
        region = idx[:ch_, :cw]
        px = ct[region]
        if transparent is not None:
            mask = region != transparent
            tgt = canvas[top : top + ch_, left : left + cw]
            tgt[mask] = px[mask]
        else:
            canvas[top : top + ch_, left : left + cw] = px
        return canvas
    raise CodecError("GIF has no image data")


# ---------------------------------------------------------------------------
# WAV — PCM via the stdlib wave module (8-bit unsigned / 16-bit signed LE)
# ---------------------------------------------------------------------------


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """((n_frames, channels) float64 samples in [-1, 1], sample_rate)."""
    try:
        with wave.open(io.BytesIO(b)) as wf:
            ch = wf.getnchannels()
            width = wf.getsampwidth()
            rate = wf.getframerate()
            n = wf.getnframes()
            frames = wf.readframes(n)
    except (wave.Error, EOFError, struct.error) as e:
        raise CodecError(f"not a PCM WAV: {e}") from e
    if width == 1:
        samples = (
            np.frombuffer(frames, np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif width == 2:
        samples = np.frombuffer(frames, "<i2").astype(np.float64) / 32768.0
    else:
        # 24/32-bit PCM is valid WAV — out of profile, not malformed
        raise UnsupportedCodecFeature(
            f"unsupported WAV sample width {width} (only 1/2)"
        )
    if ch <= 0 or len(samples) % ch:
        raise CodecError("WAV frame/channel mismatch")
    return samples.reshape(-1, ch), rate


# ---------------------------------------------------------------------------
# Real decoded features (the stand-in-free part of the media pipeline)
# ---------------------------------------------------------------------------


def image_features(px: np.ndarray, grid: int = 8) -> list[float]:
    """64-dim grayscale block-mean vector (the aHash grid, kept as
    floats so cosine dedup works on it directly) from a decoded pixel
    array — nearest-neighbor grid sampling, deterministic, no resampling
    library needed."""
    h, w = px.shape[:2]
    if px.ndim == 3:
        if px.shape[2] == 2:  # gray+alpha: luminance is channel 0 ONLY
            gray = px[:, :, 0].astype(float)
        elif px.shape[2] == 1:
            gray = px[:, :, 0].astype(float)
        else:  # RGB(A): average the 3 color channels, never alpha
            gray = px[:, :, :3].mean(axis=2)
    else:
        gray = px.astype(float)
    ys = (np.arange(grid) * h) // grid
    xs = (np.arange(grid) * w) // grid
    cell = gray[np.ix_(ys, xs)]
    return [float(v) / 255.0 for v in cell.ravel()]


def dhash64(px: np.ndarray) -> int:
    """64-bit difference hash (dHash) of a decoded pixel array — the
    standard perceptual image fingerprint: sample a 9x8 grayscale grid
    (nearest-neighbor, same sampling rule as image_features) and set
    bit r*8+c when cell[r, c] > cell[r, c+1]. Horizontal-gradient
    based, so it is invariant to uniform brightness shifts and to
    resampling that preserves the gradient structure; near-duplicate
    images land within a few bits of Hamming distance. Returned as a
    Python int in [0, 2^64) — callers store it in an int64 column via
    the signed two's-complement view."""
    h, w = px.shape[:2]
    if px.ndim == 3:
        if px.shape[2] == 2:  # gray+alpha: luminance is channel 0 ONLY
            gray = px[:, :, 0].astype(float)
        elif px.shape[2] == 1:
            gray = px[:, :, 0].astype(float)
        else:  # RGB(A): average the 3 color channels, never alpha
            gray = px[:, :, :3].mean(axis=2)
    else:
        gray = px.astype(float)
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    cell = gray[np.ix_(ys, xs)]
    bits = cell[:, :-1] > cell[:, 1:]
    out = 0
    for i, b in enumerate(bits.ravel()):
        if b:
            out |= 1 << i
    return out


def audio_features(samples: np.ndarray, rate: int, bins: int = 64) -> list[float]:
    """Coarse RMS envelope (``bins`` segments) of the mono mix — a real,
    deterministic acoustic fingerprint for near-dup detection."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return [0.0] * bins
    edges = (np.arange(bins + 1) * n) // bins
    out = []
    for i in range(bins):
        seg = mono[edges[i] : max(edges[i + 1], edges[i] + 1)]
        out.append(float(np.sqrt(np.mean(seg * seg))))
    return out
