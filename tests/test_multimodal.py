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
