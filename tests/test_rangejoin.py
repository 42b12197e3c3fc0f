"""Banded range join semantics (operators/rangejoin.py): half-open
bounds, band-edge alignment, overlapping intervals, left join, and the
hash-join (never nested-loop) plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iotdatapipeline_spark.operators import band_range_join


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 9.99), (3, 10.0), (4, 15.0), (5, 25.0), (6, 99.0)],
        "pid int, p double",
    )
    # [0,10), [10,20), [12,30) — overlapping; nothing covers 99
    ranges = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 12.0, 30.0)],
        "rid string, lo double, hi double",
    )
    return points, ranges


def expected_pairs():
    return {
        (1, "a"),           # 0.0: lo inclusive
        (2, "a"),           # 9.99 < 10
        (3, "b"),           # 10.0: hi of 'a' exclusive, lo of 'b' inclusive
        (4, "b"), (4, "c"),  # overlap → two matches
        (5, "c"),
    }


@pytest.mark.parametrize("granularity", [1.0, 4.0, 10.0, 64.0])
def test_inner_semantics_invariant_to_granularity(spark, frames, granularity):
    points, ranges = frames
    out = band_range_join(
        points, ranges, point_col="p", lo_col="lo", hi_col="hi", granularity=granularity
    )
    assert {(r.pid, r.rid) for r in out.collect()} == expected_pairs()


def test_left_join_keeps_unmatched_points(spark, frames):
    points, ranges = frames
    out = band_range_join(
        points, ranges, point_col="p", lo_col="lo", hi_col="hi", granularity=8.0, how="left"
    )
    rows = out.collect()
    assert {(r.pid, r.rid) for r in rows} == expected_pairs() | {(6, None)}
    nulls = [r for r in rows if r.pid == 6]
    assert len(nulls) == 1 and nulls[0].lo is None and nulls[0].hi is None


def test_column_clash_rejected(spark, frames):
    points, ranges = frames
    with pytest.raises(ValueError, match="collide"):
        band_range_join(
            points, ranges.withColumnRenamed("rid", "p"),
            point_col="p", lo_col="lo", hi_col="hi", granularity=8.0,
        )


def test_plan_is_hash_join_not_nested_loop(spark, frames):
    points, ranges = frames
    out = band_range_join(
        points, ranges, point_col="p", lo_col="lo", hi_col="hi", granularity=8.0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    # equi-join on the band key (hash or sort-merge, planner's pick)
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_matches_naive_range_join_on_fixture(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet").select("o_orderkey", "o_totalprice")
    region = spark.read.parquet(f"{sf_small}/region.parquet")
    bands = region.select(
        F.col("r_regionkey").alias("band_id"),
        (F.col("r_regionkey") * F.col("r_regionkey") * 30000).cast("double").alias("lo"),
        ((F.col("r_regionkey") + 1) * (F.col("r_regionkey") + 1) * 30000).cast("double").alias("hi"),
    )
    fast = band_range_join(
        orders, bands, point_col="o_totalprice", lo_col="lo", hi_col="hi", granularity=30000
    )
    naive = orders.join(
        bands, (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    )
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0
