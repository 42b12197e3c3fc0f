"""As-of join semantics (operators/asof.py): boundary inclusion,
no-prior-build nulls, per-key isolation, and the plan shape the
100 TB story depends on (one shuffle, one window — never a range-join
cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iotdatapipeline_spark.operators import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    probe = spark.createDataFrame(
        [
            ("a", 5, 100),
            ("a", 10, 101),   # exactly at a build ts → that build row applies
            ("a", 11, 102),
            ("a", 20, 103),
            ("b", 1, 200),    # before any build row for its key → null
            ("b", 50, 201),
            ("c", 9, 300),    # key with no build rows at all → null
        ],
        "k string, ts int, ev int",
    )
    build = spark.createDataFrame(
        [("a", 10, "v1"), ("a", 15, "v2"), ("b", 30, "w1")],
        "k string, ts int, val string",
    )
    return probe, build


def test_asof_semantics(spark, frames):
    probe, build = frames
    out = asof_join(probe, build, on=["k"], ts_col="ts", value_cols=["val"])
    got = {r.ev: r.val for r in out.collect()}
    assert got == {
        100: None,   # a@5: before first build
        101: "v1",   # a@10: boundary ts is inclusive
        102: "v1",   # a@11: still v1 (v2 at 15 is in the future)
        103: "v2",   # a@20: latest prior
        200: None,   # b@1: before w1
        201: "w1",
        300: None,   # c: key absent from build
    }
    # left join: probe cardinality and columns are preserved
    assert out.count() == probe.count()
    assert set(out.columns) == {"k", "ts", "ev", "val"}


def test_asof_value_col_clash_rejected(spark, frames):
    probe, build = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(probe, build.withColumnRenamed("val", "ev"), on=["k"], ts_col="ts", value_cols=["ev"])


def test_asof_plan_single_shuffle_single_window(spark, frames):
    probe, build = frames
    out = asof_join(probe, build, on=["k"], ts_col="ts", value_cols=["val"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_asof_matches_naive_range_join_on_fixture(spark, sf_small):
    """Cross-check the union-merge formulation against the brute-force
    range-join + top-1 definition on real data (small sf only — the
    naive form is quadratic per key and exists here only as an
    oracle)."""
    ev = spark.read.parquet(f"{sf_small}/events.parquet").limit(2000)
    readings = ev.select(
        F.col("user_id").alias("station"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("counter"),
    )
    cfg = (
        readings.filter(F.col("event_id") % 17 == 0)
        .groupBy("station", "ts")
        .agg(F.max("counter").alias("version"))
    )
    fast = asof_join(readings, cfg, on=["station"], ts_col="ts", value_cols=["version"])

    c = cfg.select(F.col("station").alias("cs"), F.col("ts").alias("cts"), "version")
    naive = (
        readings.join(c, (F.col("station") == F.col("cs")) & (F.col("ts") >= F.col("cts")), "left")
        .groupBy("station", "ts", "event_id", "counter")
        .agg(F.max_by("version", "cts").alias("version"))
    )
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0


@pytest.mark.parametrize("width", [1, 4, 7, 100])
def test_bucketed_path_equals_plain_path(spark, frames, width):
    """The (key, bucket)-partitioned formulation (the 100 TB path for
    low-cardinality keys) must be value-identical to the plain
    per-key window at every bucket width."""
    probe, build = frames
    plain = asof_join(probe, build, on=["k"], ts_col="ts", value_cols=["val"])
    bucketed = asof_join(
        probe, build, on=["k"], ts_col="ts", value_cols=["val"],
        bucket=F.floor(F.col("ts") / width),
    )
    assert plain.exceptAll(bucketed).count() == 0
    assert bucketed.exceptAll(plain).count() == 0


def test_bucketed_path_on_fixture(spark, sf_small):
    ev = spark.read.parquet(f"{sf_small}/events.parquet").limit(3000)
    readings = ev.select(
        F.col("user_id").alias("station"), "ts", "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("counter"),
    ).withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")))  # NTZ fixture → µs long
    cfg = (
        readings.filter(F.col("event_id") % 17 == 0)
        .groupBy("station", "ts")
        .agg(F.max("counter").alias("version"))
    )
    plain = asof_join(readings, cfg, on=["station"], ts_col="ts", value_cols=["version"])
    bucketed = asof_join(
        readings, cfg, on=["station"], ts_col="ts", value_cols=["version"],
        bucket=F.floor(F.col("ts") / 3_600_000_000),  # hourly buckets
    )
    assert plain.exceptAll(bucketed).count() == 0
    assert bucketed.exceptAll(plain).count() == 0
