"""Gate tests for the data-quality registry (plans/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotdatapipeline_spark.plans import ORACLE, QUERIES
from iotdatapipeline_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestRegistry:
    def test_registered_with_oracles(self):
        assert "dq_events_profile" in ORACLE
        assert "dq_referential_orphans" in ORACLE


class TestProfile:
    def test_profile_is_one_scan(self, spark, sf_small):
        # every rule rides the same partial aggregate: adding a rule
        # must never add a pass over the fact
        plan = _plan(QUERIES["dq_events_profile"](spark, sf_small))
        assert plan.count("FileScan") == 1, plan

    def test_profile_counts_consistent(self, spark, sf_small):
        row = QUERIES["dq_events_profile"](spark, sf_small).collect()[0]
        n = load_table(spark, sf_small, "events").count()
        assert row["n_rows"] == n
        for rule in ("null_user", "bad_props", "unknown_type"):
            assert 0 <= row[rule] <= n
        assert row["min_cents"] <= row["max_cents"]

    def test_profile_detects_planted_violations(self, spark, sf_small):
        # same rule expressions applied to a frame with known dirt:
        # the rules themselves must fire, not just return fixture zeros
        dirty = spark.createDataFrame(
            [
                (1, "{ok}", 10.0, "view"),
                (None, "oops", -3.0, "view"),      # null key, bad props, low value
                (2, None, 900.0, "mystery"),       # null props, high value, bad enum
            ],
            "user_id bigint, props string, value double, event_type string",
        )
        one = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
        row = dirty.agg(
            one(F.col("user_id").isNull()).alias("null_user"),
            one(F.col("props").isNull() | ~F.col("props").startswith("{")).alias("bad_props"),
            one((F.col("value") < 0) | (F.col("value") > 500)).alias("oor"),
            one(~F.col("event_type").isin("view", "click", "purchase", "signup", "error")).alias("bad_enum"),
        ).collect()[0]
        assert (row["null_user"], row["bad_props"], row["oor"], row["bad_enum"]) == (1, 2, 2, 1)


class TestOrphans:
    def test_clean_fixture_has_no_orphans(self, spark, sf_small):
        rows = {r["fk"]: r["n_orphans"] for r in QUERIES["dq_referential_orphans"](spark, sf_small).collect()}
        assert rows == {
            "lineitem->orders": 0,
            "orders->customer": 0,
            "supplier->nation": 0,
        }

    def test_anti_join_detects_planted_orphan(self, spark):
        child = spark.createDataFrame([(1,), (2,), (99,)], "k bigint")
        parent = spark.createDataFrame([(1,), (2,)], "k bigint")
        n = (
            child.join(parent, child["k"] == parent["k"], "left_anti")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()[0]["n"]
        )
        assert n == 1
