"""Pure-stdlib codec correctness (analytics/codecs.py) and the
strict-mode multimodal path over real BMP/PNG/WAV payloads.

Golden assets are synthesized in-test with independent encoders
(struct/zlib only), so every decode is checked against a known
pixel/sample array, not against the decoder itself."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from iotdatapipeline_spark.analytics.codecs import (
    decode_bmp,
    decode_png,
    decode_wav,
    luma,
    sniff,
)


# ── independent encoders (test-side golden-asset builders) ───────────────────


def encode_bmp(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    rows = b"".join(img[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1))
    header = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + dib + rows


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", zlib.crc32(ctype + body))


def encode_png(img: np.ndarray, filters: list[int]) -> bytes:
    """PNG encoder applying the given filter type per scanline."""
    h = img.shape[0]
    ch = 1 if img.ndim == 2 else img.shape[2]
    w = img.shape[1]
    color = {1: 0, 3: 2, 4: 6}[ch]
    flat = img.reshape(h, w * ch).astype(np.int64)
    raw = b""
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur, ft = flat[y], filters[y % len(filters)]
        a = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]]) if w * ch > ch else np.zeros_like(cur)
        b = prev
        c = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]]) if w * ch > ch else np.zeros_like(prev)
        if ft == 0:
            pred = np.zeros_like(cur)
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
        raw += bytes([ft]) + ((cur - pred) & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _rng_img(h: int, w: int, ch: int | None, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# ── codec unit tests ─────────────────────────────────────────────────────────


class TestSniff:
    def test_magic_detection(self):
        assert sniff(encode_bmp(_rng_img(4, 5, 3, 0))) == "bmp"
        assert sniff(encode_png(_rng_img(4, 5, 3, 0), [0])) == "png"
        assert sniff(encode_wav(np.zeros(8, dtype=np.int16), 16000)) == "wav"
        assert sniff(b"plain text payload, nothing binary") is None


class TestBmp:
    @pytest.mark.parametrize("h,w", [(1, 1), (3, 4), (7, 5), (16, 16)])
    def test_roundtrip(self, h, w):
        img = _rng_img(h, w, 3, seed=h * 100 + w)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)

    def test_rejects_unsupported(self):
        with pytest.raises(ValueError):
            decode_bmp(b"BM" + b"\x00" * 60)  # bpp=0


class TestPng:
    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("ch", [None, 3, 4])
    def test_roundtrip_each_filter(self, ft, ch):
        img = _rng_img(6, 5, ch, seed=ft * 10 + (ch or 1))
        np.testing.assert_array_equal(decode_png(encode_png(img, [ft])), img)

    def test_mixed_filters_and_gradient(self):
        # gradients favor Sub/Up/Paeth predictions — exercises carry paths
        img = np.add.outer(np.arange(9) * 7, np.arange(11) * 3).astype(np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(img, [0, 1, 2, 3, 4])), img)

    def test_rejects_16bit(self):
        bad = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        data = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", bad) + _png_chunk(b"IEND", b"")
        with pytest.raises(ValueError):
            decode_png(data)


class TestWav:
    @pytest.mark.parametrize("channels", [1, 2])
    def test_roundtrip(self, channels):
        t = np.arange(480 * channels)
        samples = (3000 * np.sin(t / 7.0)).astype(np.int16)
        out, rate = decode_wav(encode_wav(samples, 8000, channels))
        assert rate == 8000
        np.testing.assert_array_equal(out, samples)

    def test_rejects_non_pcm(self):
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 0)
        with pytest.raises(ValueError):
            decode_wav(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


class TestLuma:
    def test_bt601_integer(self):
        img = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
        np.testing.assert_array_equal(luma(img)[0], [76, 149, 29, 255])

    def test_greyscale_identity(self):
        g = _rng_img(3, 3, None, 1)
        assert luma(g) is g


# ── strict-mode Spark path over real payloads ────────────────────────────────


class TestStrictModeEndToEnd:
    def test_image_features_strict_on_real_formats(self, spark):
        from iotdatapipeline_spark.analytics.multimodal import ASSET_SCHEMA, image_features

        bmp_img = _rng_img(6, 9, 3, seed=42)
        png_img = _rng_img(4, 7, None, seed=43)
        rows = [
            (1, "image", bytearray(encode_bmp(bmp_img)), 0, 0, 0, 0, "{}"),
            (2, "image", bytearray(encode_png(png_img, [0, 1, 2, 3, 4])), 0, 0, 0, 0, "{}"),
        ]
        df = spark.createDataFrame(rows, ASSET_SCHEMA)
        out = {r["asset_id"]: r for r in image_features(df, strict=True).collect()}
        # dims come from the FILE, not the (zeroed) metadata
        assert (out[1]["width"], out[1]["height"], out[1]["n_pixels"]) == (9, 6, 54)
        assert out[1]["mean_luma"] == pytest.approx(float(luma(bmp_img).mean()))
        assert (out[2]["width"], out[2]["height"]) == (7, 4)
        assert out[2]["mean_luma"] == pytest.approx(float(png_img.mean()))

    def test_audio_features_strict_on_wav(self, spark):
        from iotdatapipeline_spark.analytics.multimodal import ASSET_SCHEMA, audio_features

        samples = (2000 * np.sin(np.arange(800) / 5.0)).astype(np.int16)
        rows = [(3, "audio", bytearray(encode_wav(samples, 16000)), 0, 0, 16000, 0, "{}")]
        df = spark.createDataFrame(rows, ASSET_SCHEMA)
        r = audio_features(df, strict=True).collect()[0]
        assert r["n_samples"] == 800
        assert r["duration_ms"] == 800 * 1000 // 16000
        expected_rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
        assert r["rms_x1e6"] == int(expected_rms * 1_000_000)

    def test_strict_still_refuses_unknown_formats(self, spark):
        from iotdatapipeline_spark.analytics.multimodal import ASSET_SCHEMA, image_features

        rows = [(4, "image", bytearray(b"\xff\xd8\xff jpeg-ish payload"), 4, 4, 0, 0, "{}")]
        df = spark.createDataFrame(rows, ASSET_SCHEMA)
        with pytest.raises(Exception, match="NotImplementedError|PythonException"):
            image_features(df, strict=True).collect()


# ── property tests: any image/audio roundtrips bit-exact ─────────────────────

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_prop = settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])


class TestCodecProperties:
    @_prop
    @given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1))
    def test_bmp_roundtrip_any_dims(self, h, w, seed):
        img = _rng_img(h, w, 3, seed)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)

    @_prop
    @given(
        st.integers(1, 10),
        st.integers(1, 10),
        st.sampled_from([None, 3, 4]),
        st.lists(st.integers(0, 4), min_size=1, max_size=5),
        st.integers(0, 2**32 - 1),
    )
    def test_png_roundtrip_any_filters(self, h, w, ch, filters, seed):
        img = _rng_img(h, w, ch, seed)
        np.testing.assert_array_equal(decode_png(encode_png(img, filters)), img)

    @_prop
    @given(st.integers(1, 2), st.integers(0, 500), st.integers(0, 2**32 - 1))
    def test_wav_roundtrip_any_payload(self, channels, n, seed):
        rng = np.random.default_rng(seed)
        samples = rng.integers(-32768, 32768, size=n * channels, dtype=np.int64).astype(np.int16)
        out, rate = decode_wav(encode_wav(samples, 22050, channels))
        assert rate == 22050
        np.testing.assert_array_equal(out, samples)
