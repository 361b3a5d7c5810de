"""Pure-stdlib media decoders (functions/codecs.py) + the routed
decode_media_features stage. The tests hand-roll spec-valid encoders so
every decode is checked against known pixels/samples."""

from __future__ import annotations

import struct
import wave
import zlib
from io import BytesIO

import numpy as np
import pytest

from dedupe_spark.functions import codecs as C


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def encode_png(px: np.ndarray, filters=None, color=None, plte=None) -> bytes:
    """Minimal spec-valid PNG writer: per-row filter choice is forced by
    the test so the decoder's un-filtering of every type is exercised."""
    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    if color is None:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = filters or [0] * h
    flat = px.reshape(h, w * ch).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(w * ch, np.int64)
    for y, f in enumerate(filters):
        row = flat[y]
        if f == 0:
            enc = row
        elif f == 1:
            left = np.concatenate([np.zeros(ch, np.int64), row[:-ch]])
            enc = (row - left) & 0xFF
        elif f == 2:
            enc = (row - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(ch, np.int64), row[:-ch]])
            enc = (row - (left + prev) // 2) & 0xFF
        elif f == 4:
            enc = np.zeros(w * ch, np.int64)
            for x in range(w * ch):
                a = row[x - ch] if x >= ch else 0
                c = prev[x - ch] if x >= ch else 0
                enc[x] = (row[x] - C._paeth(a, prev[x], c)) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + _chunk(b"IEND", b"")


def encode_bmp(px: np.ndarray, top_down=False) -> bytes:
    h, w, ch = px.shape
    stride = (w * ch + 3) & ~3
    bgr = px[:, :, ([2, 1, 0] + ([3] if ch == 4 else []))]
    rows = bgr if top_down else bgr[::-1]
    body = bytearray()
    for y in range(h):
        r = rows[y].tobytes()
        body.extend(r + b"\x00" * (stride - len(r)))
    data_off = 54
    hdr = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, -h if top_down else h, 1, ch * 8, 0, len(body),
            2835, 2835, 0, 0,
        )
    )
    return hdr + bytes(body)


def encode_wav(samples: np.ndarray, rate: int, width: int = 2) -> bytes:
    buf = BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(width)
        wf.setframerate(rate)
        if width == 2:
            wf.writeframes(
                (samples * 32768.0).clip(-32768, 32767)
                .astype("<i2").tobytes()
            )
        else:
            wf.writeframes(
                ((samples * 128.0) + 128).clip(0, 255)
                .astype(np.uint8).tobytes()
            )
    return buf.getvalue()


RGB = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(3, 5, 3) * 4


def test_png_roundtrip_every_filter_type():
    for f in range(5):
        b = encode_png(RGB, filters=[f] * 3)
        np.testing.assert_array_equal(C.decode_png(b), RGB)
    # mixed filters across rows
    b = encode_png(RGB, filters=[1, 4, 3])
    np.testing.assert_array_equal(C.decode_png(b), RGB)


def test_png_roundtrip_gray_alpha_rgba():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    np.testing.assert_array_equal(
        C.decode_png(encode_png(gray)), gray.reshape(3, 4, 1)
    )
    rgba = np.random.default_rng(7).integers(0, 255, (4, 3, 4), np.uint8)
    np.testing.assert_array_equal(
        C.decode_png(encode_png(rgba, filters=[2, 4, 1, 3])), rgba
    )


def test_png_palette_expands_to_rgb():
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)
    b = encode_png(idx, color=3, plte=plte)
    np.testing.assert_array_equal(C.decode_png(b), plte[idx])


def test_png_rejects_unsupported():
    with pytest.raises(C.CodecError, match="not a PNG"):
        C.decode_png(b"GIF89a")
    b16 = bytearray(encode_png(RGB))
    b16[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(C.CodecError, match="bit depth"):
        C.decode_png(bytes(b16))
    bi = bytearray(encode_png(RGB))
    bi[28] = 1  # interlace byte
    with pytest.raises(C.CodecError, match="interlaced"):
        C.decode_png(bytes(bi))
    with pytest.raises(C.CodecError, match="stream|size|truncated"):
        C.decode_png(encode_png(RGB)[:50] + b"\x00" * 40)


def test_bmp_roundtrip_bottom_up_and_top_down_with_padding():
    # w=5, 24bpp -> 15-byte rows padded to 16: padding must be stripped
    np.testing.assert_array_equal(C.decode_bmp(encode_bmp(RGB)), RGB)
    np.testing.assert_array_equal(
        C.decode_bmp(encode_bmp(RGB, top_down=True)), RGB
    )
    rgba = np.random.default_rng(3).integers(0, 255, (2, 3, 4), np.uint8)
    np.testing.assert_array_equal(C.decode_bmp(encode_bmp(rgba)), rgba)


def test_bmp_rejects_compressed_and_truncated():
    b = bytearray(encode_bmp(RGB))
    b[30] = 1  # BI_RLE8
    with pytest.raises(C.CodecError, match="BI_RGB"):
        C.decode_bmp(bytes(b))
    with pytest.raises(C.CodecError, match="truncated"):
        C.decode_bmp(encode_bmp(RGB)[:-8])


def test_wav_roundtrip_16_and_8_bit():
    t = np.linspace(0, 1, 800, endpoint=False)
    stereo = np.stack([np.sin(2 * np.pi * 5 * t), np.cos(2 * np.pi * 3 * t)], 1)
    out, rate = C.decode_wav(encode_wav(stereo, 8000))
    assert rate == 8000 and out.shape == (800, 2)
    np.testing.assert_allclose(out, stereo, atol=1 / 32000)
    mono8, rate8 = C.decode_wav(encode_wav(stereo[:, :1], 4000, width=1))
    assert rate8 == 4000 and mono8.shape == (800, 1)
    np.testing.assert_allclose(mono8, stereo[:, :1], atol=1 / 120)


def test_wav_rejects_garbage():
    with pytest.raises(C.CodecError):
        C.decode_wav(b"RIFFxxxxWAVE" + b"\x00" * 10)


def test_image_and_audio_features_shapes():
    f = C.image_features(RGB)
    assert len(f) == 64 and all(0.0 <= v <= 1.0 for v in f)
    # identical images -> identical features; a changed image differs
    assert f == C.image_features(RGB.copy())
    other = RGB.copy()
    other[0, 0] = 255
    assert f != C.image_features(other)
    t = np.linspace(0, 1, 400, endpoint=False).reshape(-1, 1)
    a = C.audio_features(np.sin(6.28 * 4 * t), 8000)
    assert len(a) == 64 and max(a) <= 1.0


def test_decode_media_features_routes_real_fake_error(spark):
    from dedupe_spark.operators.multimodal import decode_media_features

    png = encode_png(RGB, filters=[4, 2, 1])
    t = np.linspace(0, 1, 100, endpoint=False).reshape(-1, 1)
    wav = encode_wav(np.sin(6.28 * 3 * t), 8000)
    # WEBP: a codec-gated format (JPEG is now really decoded — test_jpeg)
    webp = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
    broken_png = png[:40] + b"\x00" * 30  # sniffs as png, fails decode
    df = spark.createDataFrame(
        [
            ("img", bytearray(png)),
            ("aud", bytearray(wav)),
            ("jpg", bytearray(webp)),
            ("bad", bytearray(broken_png)),
        ],
        "media_id string, content binary",
    )
    out = {r["media_id"]: r for r in decode_media_features(df).collect()}
    img = out["img"]
    assert img["decoded"] == "real" and (img["width"], img["height"]) == (5, 3)
    assert img["feature"] == C.image_features(C.decode_png(png))
    aud = out["aud"]
    assert aud["decoded"] == "real" and aud["sample_rate_hz"] == 8000
    assert aud["n_samples"] == 100 and aud["channels"] == 1
    assert out["jpg"]["decoded"] == "fake" and len(out["jpg"]["feature"]) == 64
    assert out["bad"]["decoded"] == "error" and out["bad"]["feature"] is None


# ---------------------------------------------------------------------------
# GIF: a real LZW encoder (dict-based string table — a DIFFERENT algorithm
# from the decoder's code table, so roundtrips cross-check both) + container
# ---------------------------------------------------------------------------


def _lzw_encode(indices, m: int, clear_every: int | None = None) -> bytes:
    clear, end = 1 << m, (1 << m) + 1
    base = end + 1  # decoder's table size right after a clear

    bits = bytearray()
    state = {"buf": 0, "n": 0, "width": m + 1}

    def emit(code):
        state["buf"] |= code << state["n"]
        state["n"] += state["width"]
        while state["n"] >= 8:
            bits.append(state["buf"] & 0xFF)
            state["buf"] >>= 8
            state["n"] -= 8

    def reset():
        state["width"] = m + 1
        return {bytes([i]): i for i in range(clear)}, base, 0

    emit(clear)
    table, next_code, n_emitted = reset()

    def after_emit():
        # mirror the decoder: its table size after our k-th data code is
        # base + k - 1; it widens when that hits 2^width
        nonlocal n_emitted
        n_emitted += 1
        if base + n_emitted - 1 == (1 << state["width"]) and state["width"] < 12:
            state["width"] += 1

    s = b""
    for px in indices:
        c = bytes([int(px)])
        if s + c in table:
            s = s + c
            continue
        emit(table[s])
        after_emit()
        table[s + c] = next_code
        next_code += 1
        s = c
        if clear_every and n_emitted % clear_every == 0:
            emit(clear)
            table, next_code, n_emitted = reset()
    if s:
        emit(table[s])
        after_emit()
    emit(end)
    if state["n"]:
        bits.append(state["buf"] & 0xFF)
    return bytes(bits)


def encode_gif(
    idx: np.ndarray,
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
    transparent: int | None = None,
    screen: tuple[int, int] | None = None,
    offset: tuple[int, int] = (0, 0),
    bg: int = 0,
    clear_every: int | None = None,
) -> bytes:
    h, w = idx.shape
    sw, sh = screen or (w, h)
    m = max(2, (len(palette) - 1).bit_length())
    pal = list(palette) + [(0, 0, 0)] * ((1 << m) - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (m - 1), bg, 0])
    for rgb in pal:
        out += bytes(rgb)
    if transparent is not None:
        out += b"\x21\xf9\x04\x01\x00\x00" + bytes([transparent]) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHH", offset[0], offset[1], w, h)
    out += bytes([0x40 if interlace else 0x00])
    rows = idx
    if interlace:  # stream order = the four interlace passes
        order = [y for s0, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(s0, h, st)]
        rows = idx[order]
    data = _lzw_encode(rows.ravel(), m, clear_every=clear_every)
    out += bytes([m])
    for i in range(0, len(data), 255):
        blk = data[i : i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)


_GIF_PAL8 = [
    (0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255),
    (255, 255, 0), (0, 255, 255), (255, 0, 255), (255, 255, 255),
]


def test_gif_hand_pinned_bytes():
    # 3x1, pixels [1,1,2]; LZW codes [CLEAR,1,1,2,END] at width 3 packed
    # by hand to 4C 54 — pins the decoder to the spec, not to our encoder
    gif = (
        b"GIF89a" + b"\x03\x00\x01\x00" + b"\x81\x00\x00"
        + bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
        + b"\x2c\x00\x00\x00\x00\x03\x00\x01\x00\x00"
        + b"\x02" + b"\x02\x4c\x54\x00" + b"\x3b"
    )
    assert C.decode_gif(gif).tolist() == [[[255, 0, 0], [255, 0, 0], [0, 255, 0]]]


def test_gif_roundtrip_with_code_width_growth():
    # 64x64 8-color deterministic pattern: thousands of table entries, so
    # the variable code width climbs well past the initial m+1 bits
    yy, xx = np.mgrid[0:64, 0:64]
    idx = ((yy * 7 + xx * 3 + (xx * yy) % 5) % 8).astype(np.uint8)
    px = C.decode_gif(encode_gif(idx, _GIF_PAL8))
    assert px.shape == (64, 64, 3)
    assert np.array_equal(px, np.array(_GIF_PAL8, np.uint8)[idx])


def test_gif_midstream_clear_code_resets_table():
    yy, xx = np.mgrid[0:32, 0:32]
    idx = ((yy + xx) % 8).astype(np.uint8)
    with_clears = encode_gif(idx, _GIF_PAL8, clear_every=40)
    assert np.array_equal(
        C.decode_gif(with_clears), np.array(_GIF_PAL8, np.uint8)[idx]
    )


def test_gif_interlaced_roundtrip():
    yy, xx = np.mgrid[0:16, 0:9]
    idx = ((yy * 3 + xx) % 8).astype(np.uint8)
    px = C.decode_gif(encode_gif(idx, _GIF_PAL8, interlace=True))
    assert np.array_equal(px, np.array(_GIF_PAL8, np.uint8)[idx])


def test_gif_transparency_composes_onto_background():
    # 2x2 frame at offset (1,1) on a 4x3 screen, index 0 transparent, bg=7
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    gif = encode_gif(
        idx, _GIF_PAL8, transparent=0, screen=(4, 3), offset=(1, 1), bg=7
    )
    px = C.decode_gif(gif)
    white = [255, 255, 255]
    assert px.shape == (3, 4, 3)
    assert px[0].tolist() == [white] * 4  # untouched background row
    assert px[1, 1].tolist() == white     # transparent pixel shows bg
    assert px[1, 2].tolist() == [255, 0, 0]
    assert px[2, 1].tolist() == [0, 255, 0]
    assert px[2, 2].tolist() == white


def test_gif_rejects_malformed():
    good = encode_gif(np.zeros((4, 4), np.uint8), _GIF_PAL8)
    with pytest.raises(C.CodecError):
        C.decode_gif(b"GIF89a\x00")  # truncated header
    with pytest.raises(C.CodecError):
        C.decode_gif(good[:30])  # truncated mid-stream
    with pytest.raises(C.CodecError):  # trailer before any image
        C.decode_gif(b"GIF89a" + struct.pack("<HH", 1, 1) + b"\x00\x00\x00\x3b")
    with pytest.raises(C.CodecError):
        C.decode_gif(good[:-10] + b"\xff" * 10)  # unterminated sub-blocks


def test_decode_media_features_gif_is_real(spark):
    from dedupe_spark.operators.multimodal import decode_media_features

    yy, xx = np.mgrid[0:8, 0:8]
    idx = ((yy + xx) % 8).astype(np.uint8)
    gif = encode_gif(idx, _GIF_PAL8)
    df = spark.createDataFrame(
        [("g1", bytearray(gif))], "media_id string, content binary"
    )
    row = decode_media_features(df).collect()[0]
    assert row["decoded"] == "real" and row["format"] == "gif"
    assert (row["width"], row["height"], row["channels"]) == (8, 8, 3)
    assert row["feature"] == C.image_features(C.decode_gif(gif))


# ---------------------------------------------------------------------------
# review-fix regressions
# ---------------------------------------------------------------------------


def test_gray_alpha_features_ignore_alpha():
    # fully opaque gray-100: luminance must be 100/255, alpha untouched
    ga = np.full((8, 8, 2), 100, np.uint8)
    ga[:, :, 1] = 255
    gray = np.full((8, 8), 100, np.uint8)
    assert C.image_features(ga) == C.image_features(gray)


def test_malformed_plte_is_codec_error():
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", b"\x01\x02\x03\x04")  # 4 bytes: not a palette
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(C.CodecError):
        C.decode_png(bad)


def test_png_inflate_bomb_is_bounded():
    # 1x1 gray whose IDAT inflates to 10 MB: must fail WITHOUT
    # materializing the payload (bounded decompressobj)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(C.CodecError, match="size mismatch"):
        C.decode_png(bomb)


def test_out_of_profile_media_routes_to_unsupported():
    # 16-bit PNG: valid, out of profile
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr16)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(C.UnsupportedCodecFeature):
        C.decode_png(png16)
    # 24-bit WAV: valid, out of profile
    buf = BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x00\x00" * 4)
    with pytest.raises(C.UnsupportedCodecFeature):
        C.decode_wav(buf.getvalue())


def test_xls_numeric_nonfinite_does_not_crash():
    from dedupe_spark.sources.xls_biff import _decode_rk, _fmt_num

    assert _fmt_num(float("inf")) == "inf"
    assert _fmt_num(float("nan")) == "nan"
    assert _fmt_num(3.0) == "3"
    # RK double whose top 30 bits encode +inf
    assert _decode_rk(0x7FF00000 & ~0x3) == "inf"
