"""Gate tests for the behavioral registry (plans/behavioral.py):
funnel ordering/window invariants, cohort identities, and the
determinism + exact-count properties of the stratified sampler.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from iotdatapipeline_spark.plans import ORACLE, QUERIES
from iotdatapipeline_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestRegistry:
    def test_all_registered_with_oracles(self):
        for name in (
            "events_funnel_stages",
            "events_cohort_retention",
            "docs_stratified_sample",
        ):
            assert name in QUERIES and name in ORACLE, name


class TestFunnel:
    def test_stage_times_ordered_and_windowed(self, spark, sf_small):
        rows = QUERIES["events_funnel_stages"](spark, sf_small).collect()
        assert rows
        H48 = 48 * 3600
        for r in rows:
            if r["t2"] is not None:
                assert r["t1"] is not None
                assert 0 <= (r["t2"] - r["t1"]).total_seconds() < H48
            if r["t3"] is not None:
                assert r["t2"] is not None
                assert 0 <= (r["t3"] - r["t2"]).total_seconds() < H48

    def test_one_row_per_viewing_user(self, spark, sf_small):
        df = QUERIES["events_funnel_stages"](spark, sf_small)
        ev = load_table(spark, sf_small, "events")
        n_viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct().count()
        assert df.count() == n_viewers
        assert df.select("user_id").distinct().count() == n_viewers

    def test_no_cartesian(self, spark, sf_small):
        plan = _plan(QUERIES["events_funnel_stages"](spark, sf_small))
        assert "CartesianProduct" not in plan, plan

    def test_single_exchange_no_joins(self, spark, sf_small):
        # r13: every hop is an unordered window MIN chained over ONE
        # user-keyed partitioning — the join-per-hop form paid 7 scans
        # and 6 joins for 3 stages
        plan = _plan(QUERIES["events_funnel_stages"](spark, sf_small))
        assert "Join" not in plan, plan
        assert plan.count("Exchange") == 1, plan
        assert plan.count("Window") == 3, plan

    def test_cohort_no_join_single_fact_pass(self, spark, sf_small):
        # r13: first-seen day is a window MIN over the user partition,
        # not an aggregate joined back onto a second scan
        plan = _plan(QUERIES["events_cohort_retention"](spark, sf_small))
        assert "Join" not in plan, plan
        assert plan.count("FileScan") == 1, plan
        assert plan.count("Window") == 1, plan


class TestCohort:
    def test_day_zero_counts_every_user_once(self, spark, sf_small):
        # every user is active on their own cohort day, so the
        # day_offset=0 diagonal sums to |users|
        df = QUERIES["events_cohort_retention"](spark, sf_small)
        diag = (
            df.filter(F.col("day_offset") == 0).agg(F.sum("n_active")).collect()[0][0]
        )
        n_users = load_table(spark, sf_small, "events").select("user_id").distinct().count()
        assert diag == n_users

    def test_offsets_non_negative(self, spark, sf_small):
        df = QUERIES["events_cohort_retention"](spark, sf_small)
        assert df.filter(F.col("day_offset") < 0).count() == 0


class TestStratifiedSample:
    def test_exact_ceil_count_per_stratum(self, spark, sf_small):
        sample = QUERIES["docs_stratified_sample"](spark, sf_small)
        got = {r["lang"]: r["cnt"] for r in sample.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        pop = {
            r["lang"]: r["cnt"]
            for r in load_table(spark, sf_small, "documents")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        assert set(got) == set(pop)
        for lang, n in pop.items():
            assert got[lang] == math.ceil(0.1 * n), (lang, n, got[lang])

    def test_deterministic_across_runs_and_partitionings(self, spark, sf_small):
        a = {
            (r["lang"], r["doc_id"])
            for r in QUERIES["docs_stratified_sample"](spark, sf_small).collect()
        }
        # second run over a repartitioned source must draw the SAME docs
        d = (
            load_table(spark, sf_small, "documents")
            .repartition(7, "doc_id")
            .select("doc_id", "lang")
        )
        from pyspark.sql import Window

        w_rank = Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
        )
        w_n = Window.partitionBy("lang")
        b = {
            (r["lang"], r["doc_id"])
            for r in d.withColumn("rn", F.row_number().over(w_rank))
            .withColumn("n", F.count(F.lit(1)).over(w_n))
            .filter(F.col("rn") <= F.ceil(0.1 * F.col("n")).cast("long"))
            .select("lang", "doc_id")
            .collect()
        }
        assert a == b


class TestArgmaxHash:
    def test_packed_scalar_matches_struct_ordered(self, spark):
        """argmax_per_group_hash over a packed scalar must pick the same
        rows as the struct-ordered argmax_per_group (the SortAggregate
        formulation it replaces in top1_active_record)."""
        from pyspark.sql import Row, functions as F

        from iotdatapipeline_spark.operators import argmax_per_group, argmax_per_group_hash

        rows = [
            Row(k=i % 7, status=s, rid=i, pay=float(i) * 1.5)
            for i, s in enumerate("FOPFOPFOPFOPFOPFOPFO")
        ]
        df = spark.createDataFrame(rows)
        ref = argmax_per_group(df, ["k"], ["status", "rid"]).select("k", "status", "rid", "pay")
        pack = F.ascii("status").cast("long") * F.lit(2**52) + F.col("rid")
        got = argmax_per_group_hash(df, ["k"], pack, ["pay"]).select(
            "k",
            F.char((F.col("__argmax_ord") / F.lit(2**52)).cast("int")).alias("status"),
            (F.col("__argmax_ord") % F.lit(2**52)).alias("rid"),
            "pay",
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))

    def test_plans_hash_aggregate(self, spark):
        """The packed formulation must stay in the hash path — a
        SortAggregate regression is the exact bug this replaced."""
        from pyspark.sql import Row, functions as F

        from iotdatapipeline_spark.operators import argmax_per_group_hash

        df = spark.createDataFrame([Row(k=1, o=2, p=3.0)])
        out = argmax_per_group_hash(df, ["k"], F.col("o"), ["p"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan and "SortAggregate" not in plan

    def test_front_door_routes_single_order_to_hash(self, spark):
        """r11 verdict #6 + r12 advice: the hash fast path is OPT-IN
        via order_unique=True (the caller's no-ties declaration) —
        there it plans HashAggregate and matches the struct form
        row-for-row; the default and multi-column orders route to the
        explicitly named struct fallback."""
        from pyspark.sql import Row

        from iotdatapipeline_spark.operators import (
            argmax_per_group,
            argmax_per_group_struct,
        )

        rows = [Row(k=i % 5, rid=i, pay=float(i) * 0.5) for i in range(40)]
        df = spark.createDataFrame(rows)
        got = argmax_per_group(df, ["k"], ["rid"], order_unique=True)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan and "SortAggregate" not in plan
        ref = argmax_per_group_struct(df, ["k"], ["rid"])
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
        assert got.columns == df.columns
        # a var-length payload demotes (hash-agg buffers are fixed-width
        # only) but the ROWS must still match the struct form
        tagged = df.withColumn("tag", F.concat(F.lit("t"), F.col("rid")))
        got_t = argmax_per_group(tagged, ["k"], ["rid"], order_unique=True)
        ref_t = argmax_per_group_struct(tagged, ["k"], ["rid"])
        assert sorted(map(tuple, got_t.collect())) == sorted(map(tuple, ref_t.collect()))
        # multi-column order: delegates to the struct (SortAggregate) form
        multi = argmax_per_group(df, ["k"], ["pay", "rid"])
        ref2 = argmax_per_group_struct(df, ["k"], ["pay", "rid"])
        assert sorted(map(tuple, multi.collect())) == sorted(map(tuple, ref2.collect()))

    def test_default_is_tie_coherent(self, spark):
        """r12 advice: without order_unique, a TIED single-column order
        must return one coherent input row (struct routing), never a
        torn row mixing columns of two tied inputs."""
        from pyspark.sql import Row

        from iotdatapipeline_spark.operators import argmax_per_group

        rows = [Row(k=1, o=5, a="x", b=1.0), Row(k=1, o=5, a="y", b=2.0)]
        df = spark.createDataFrame(rows)
        out = argmax_per_group(df, ["k"], ["o"]).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["a"], r["b"]) in {("x", 1.0), ("y", 2.0)}  # coherent, not torn
        plan_df = argmax_per_group(df, ["k"], ["o"])
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "SortAggregate" in plan  # routed through the struct form

    def test_packed_order_roundtrip_and_range_check(self, spark):
        """packed_order keeps the hash plan, decodes exactly at high
        bits (shiftright, not float division), and RAISES on
        out-of-range fields instead of silently mis-ordering."""
        from pyspark.sql import Row

        from iotdatapipeline_spark.operators import (
            argmax_per_group_hash,
            packed_major,
            packed_minor,
            packed_order,
        )

        rows = [Row(k=1, mj=70, mn=(2**52 - 3) + i, p=float(i)) for i in range(3)]
        df = spark.createDataFrame(rows)
        out = argmax_per_group_hash(
            df, ["k"], packed_order("mj", "mn"), ["p"]
        ).select(
            "k",
            packed_major("__argmax_ord").alias("mj"),
            packed_minor("__argmax_ord").alias("mn"),
            "p",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan and "SortAggregate" not in plan
        assert [tuple(r) for r in out.collect()] == [(1, 70, 2**52 - 1, 2.0)]
        bad = spark.createDataFrame([Row(k=1, mj=70, mn=2**52, p=0.0)])
        with pytest.raises(Exception, match="packed_order"):
            bad.select(packed_order("mj", "mn")).collect()
        neg = spark.createDataFrame([Row(k=1, mj=-1, mn=5, p=0.0)])
        with pytest.raises(Exception, match="packed_order"):
            neg.select(packed_order("mj", "mn")).collect()
