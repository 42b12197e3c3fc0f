"""Gate tests for the reaggregation registry (plans/sketches.py):
the HLL sketch-union accuracy bound (its stand-in for a SQL oracle)
and the partial-merge identities of the additive rollup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iotdatapipeline_spark.plans import ORACLE, QUERIES
from iotdatapipeline_spark.sources import load_table


class TestRegistry:
    def test_weekly_is_oracled_hll_is_rows_only(self):
        assert "events_reaggregated_weekly" in ORACLE
        assert "station_distinct_users_hll" in QUERIES
        assert "station_distinct_users_hll" not in ORACLE  # sketch: engine-specific


class TestReaggregation:
    def test_weekly_merge_equals_direct(self, spark, sf_small):
        # two-level (daily → weekly) must equal one-level from raw:
        # the commutative-monoid property that makes partials safe
        merged = QUERIES["events_reaggregated_weekly"](spark, sf_small)
        ev = load_table(spark, sf_small, "events")
        direct = ev.groupBy(
            F.col("user_id").alias("station"),
            F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"),
        ).agg(
            F.sum(F.floor(F.col("value") * 100)).cast("long").alias("week_cents"),
            F.count(F.lit(1)).alias("week_n"),
        )
        assert merged.exceptAll(direct).count() == 0
        assert direct.exceptAll(merged).count() == 0

    def test_hll_union_estimate_within_bound(self, spark, sf_small):
        # union-of-daily-sketches estimate vs exact distinct: HLL
        # (lgConfigK=12 default) has ~1.6% standard error; assert 5%
        approx = {
            r["event_type"]: r["approx_users"]
            for r in QUERIES["station_distinct_users_hll"](spark, sf_small).collect()
        }
        ev = load_table(spark, sf_small, "events")
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert set(approx) == set(exact)
        for et, n in exact.items():
            assert abs(approx[et] - n) <= max(1, 0.05 * n), (et, approx[et], n)

    def test_hll_event_totals_survive_rollup(self, spark, sf_small):
        # the additive companion column must still be exact
        df = QUERIES["station_distinct_users_hll"](spark, sf_small)
        total = df.agg(F.sum("n_events")).collect()[0][0]
        assert total == load_table(spark, sf_small, "events").count()
