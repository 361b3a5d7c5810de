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
    jpeg = b"\xff\xd8\xff\xc0" + struct.pack(">HBHH", 8, 8, 4, 5) + b"\xff\xd9"
    broken_png = png[:40] + b"\x00" * 30  # sniffs as png, fails decode
    df = spark.createDataFrame(
        [
            ("img", bytearray(png)),
            ("aud", bytearray(wav)),
            ("jpg", bytearray(jpeg)),
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
