"""Multimodal plumbing tests: schemas, batch shapes, determinism, and
the strict-mode codec gate. The codecs themselves are stubbed (no
media libs in this container) — what's under test is the Spark side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iotdatapipeline_spark.analytics.multimodal import (
    audio_features,
    image_features,
    sample_frames,
    synth_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    return synth_assets(spark, n=30).cache()


class TestImageFeatures:
    def test_schema_and_counts(self, spark, assets):
        out = image_features(assets)
        assert out.columns == ["asset_id", "width", "height", "n_pixels", "mean_luma", "content_hash"]
        rows = out.collect()
        assert len(rows) == assets.filter(F.col("kind") == "image").count()
        for r in rows:
            assert r["n_pixels"] == r["width"] * r["height"]
            assert 0.0 <= r["mean_luma"] <= 255.0
            assert len(r["content_hash"]) == 32

    def test_deterministic(self, spark, assets):
        a = sorted(map(tuple, image_features(assets).collect()))
        b = sorted(map(tuple, image_features(assets).collect()))
        assert a == b

    def test_strict_mode_raises(self, spark, assets):
        with pytest.raises(Exception, match="NotImplementedError|codec"):
            image_features(assets, strict=True).collect()


class TestAudioFeatures:
    def test_pcm_semantics(self, spark, assets):
        rows = audio_features(assets).collect()
        assert len(rows) == assets.filter(F.col("kind") == "audio").count()
        for r in rows:
            assert r["duration_ms"] == (r["n_samples"] * 1000) // r["sample_rate"]
            assert r["rms_x1e6"] >= 0


class TestFrameSampling:
    def test_fanout_shape(self, spark, assets):
        out = sample_frames(assets, every_n=10)
        per_asset = {r["asset_id"]: r["n"] for r in out.groupBy("asset_id").agg(F.count(F.lit(1)).alias("n")).collect()}
        expected = {
            r["asset_id"]: (r["n_frames"] + 9) // 10
            for r in assets.filter(F.col("kind") == "video").collect()
        }
        assert per_asset == expected

    def test_binary_column_pruned_for_metadata_query(self, spark, assets, tmp_path):
        # metadata-only query over a parquet asset table must not read `media`
        path = str(tmp_path / "assets")
        assets.write.parquet(path)
        meta_only = spark.read.parquet(path).select("asset_id", "kind", "width").filter(F.col("kind") == "image")
        plan = meta_only._jdf.queryExecution().executedPlan().toString()
        assert "media" not in plan


class TestResize:
    def test_resize_matches_numpy_reference(self, spark, assets):
        from iotdatapipeline_spark.analytics.multimodal import (
            _decode_image_bytes,
            resize_images,
        )
        import hashlib
        import numpy as np

        out = {
            r["asset_id"]: r
            for r in resize_images(assets, out_width=8, out_height=6).collect()
        }
        imgs = assets.filter(F.col("kind") == "image").collect()
        assert len(out) == len(imgs) > 0
        for r in imgs:
            img = _decode_image_bytes(bytes(r["media"]), r["width"], r["height"], False)
            h, w = img.shape
            ys = (np.arange(6) * h) // 6
            xs = (np.arange(8) * w) // 8
            ref = img[np.ix_(ys, xs)]
            got = out[r["asset_id"]]
            assert got["pix_sum"] == int(ref.astype(np.int64).sum())
            assert got["resized_hash"] == hashlib.md5(ref.tobytes()).hexdigest()
            assert (got["out_height"], got["out_width"]) == (6, 8)

    def test_resize_real_bmp_decode_path(self, spark):
        # a REAL BMP flows through the same operator: identity-size
        # resize must reproduce the original luma exactly
        import numpy as np
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_codecs import encode_bmp
        from iotdatapipeline_spark.analytics.codecs import decode_bmp, luma
        from iotdatapipeline_spark.analytics.multimodal import resize_images

        rng = np.random.default_rng(11)
        img = rng.integers(0, 255, size=(6, 8, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, "image", bytearray(encode_bmp(img)), 8, 6, 0, 0, "{}")],
            "asset_id bigint, kind string, media binary, width int, height int, "
            "sample_rate int, n_frames int, meta string",
        )
        row = resize_images(df, out_width=8, out_height=6, strict=True).collect()[0]
        expect = luma(decode_bmp(encode_bmp(img))).astype(np.int64).sum()
        assert row["pix_sum"] == int(expect)


class TestEmitPixels:
    def test_emit_pixels_consistent_with_summary(self, spark, assets):
        from iotdatapipeline_spark.analytics.multimodal import resize_images

        out = resize_images(assets, out_width=8, out_height=8, emit_pixels=True)
        rows = out.collect()
        assert rows
        for r in rows:
            assert len(r["resized"]) == 64
            assert sum(r["resized"]) == r["pix_sum"]

    def test_avghash_bit_rule(self, spark, assets):
        """Native-expression avg-hash bits over the emitted pixels must
        follow the strict 64·p > sum rule exactly."""
        from iotdatapipeline_spark.analytics.multimodal import resize_images

        out = resize_images(assets, out_width=8, out_height=8, emit_pixels=True)
        px = F.expr(
            "transform(sequence(1, 64), i -> cast(conv(hex(substring(resized, i, 1)), 16, 10) as bigint))"
        )
        bits = F.concat_ws(
            "",
            F.transform(px, lambda p: F.when(p * 64 > F.col("pix_sum"), F.lit("1")).otherwise(F.lit("0"))),
        )
        for r in out.select("resized", "pix_sum", bits.alias("avghash")).collect():
            want = "".join("1" if b * 64 > r["pix_sum"] else "0" for b in r["resized"])
            assert r["avghash"] == want


class TestPillowSeam:
    """The [imaging] extra's decode seam (_pillow_decode), exercised
    with a mocked ``PIL`` in sys.modules — no media wheels in this
    sandbox, same pattern as tests/test_connectors.py. Driver-side
    pure-function tests: in production the import runs inside the
    mapInPandas Arrow batch on executors, identical code path."""

    JPEG_MAGIC = b"\xff\xd8\xff\xe0" + b"\x00" * 64

    def _mock_pil(self, monkeypatch, rgb):
        import sys
        import types

        class _Img:
            def convert(self, mode):
                assert mode == "RGB"
                return rgb

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        image_mod = types.ModuleType("PIL.Image")
        opened = []

        def _open(buf):
            opened.append(buf.read()[:4])
            return _Img()

        image_mod.open = _open
        pil = types.ModuleType("PIL")
        pil.Image = image_mod
        monkeypatch.setitem(sys.modules, "PIL", pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
        return opened

    def test_sniff_recognizes_pillow_formats(self):
        from iotdatapipeline_spark.analytics import codecs

        assert codecs.sniff(self.JPEG_MAGIC) == "jpeg"
        assert codecs.sniff(b"GIF89a" + b"\x00" * 16) == "gif"
        assert codecs.sniff(b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 8) == "webp"
        # RIFF/WAVE still wins over webp
        assert codecs.sniff(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 8) == "wav"

    def test_jpeg_decodes_through_mocked_pillow(self, monkeypatch):
        import numpy as np

        from iotdatapipeline_spark.analytics.multimodal import _decode_image_bytes

        rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        opened = self._mock_pil(monkeypatch, rgb)
        out = _decode_image_bytes(self.JPEG_MAGIC, 3, 2, strict=True)
        # the full payload reached Image.open and the luma shape is (H, W)
        assert opened == [b"\xff\xd8\xff\xe0"]
        assert out.shape == (2, 3) and out.dtype == np.uint8
        # BT.601 of the known ramp
        from iotdatapipeline_spark.analytics import codecs

        assert (out == codecs.luma(rgb)).all()

    def test_without_pillow_strict_names_the_extra(self, monkeypatch):
        import builtins
        import sys

        import pytest as _pytest

        from iotdatapipeline_spark.analytics.multimodal import _decode_image_bytes

        monkeypatch.delitem(sys.modules, "PIL", raising=False)
        monkeypatch.delitem(sys.modules, "PIL.Image", raising=False)
        real_import = builtins.__import__

        def no_pil(name, *a, **k):
            if name == "PIL" or name.startswith("PIL."):
                raise ImportError("No module named 'PIL'")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", no_pil)
        with _pytest.raises(NotImplementedError, match=r"\[imaging\]"):
            _decode_image_bytes(self.JPEG_MAGIC, 4, 4, strict=True)
        # non-strict: deterministic fake, shaped by the metadata dims
        out = _decode_image_bytes(self.JPEG_MAGIC, 4, 4, strict=False)
        assert out.shape == (4, 4)
        out2 = _decode_image_bytes(self.JPEG_MAGIC, 4, 4, strict=False)
        assert (out == out2).all()

    def test_native_formats_never_touch_pillow(self, monkeypatch):
        """BMP/PNG stay on the stdlib codecs even when Pillow exists:
        the hash-verified gates must not change under the extra."""
        import iotdatapipeline_spark.analytics.multimodal as mm

        def boom(data):
            raise AssertionError("native format routed to Pillow")

        monkeypatch.setattr(mm, "_pillow_decode", boom)
        import os
        import sys

        import numpy as np

        sys.path.insert(0, os.path.dirname(__file__))
        from test_codecs import encode_bmp

        img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
        out = mm._decode_image_bytes(encode_bmp(img), 5, 4, strict=True)
        assert out.shape == (4, 5)
