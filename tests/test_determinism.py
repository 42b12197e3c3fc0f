"""Partitioning-independence: a distributed engine's results must not
depend on the physical shuffle layout. Rerun order-sensitive queries
under a different spark.sql.shuffle.partitions and repartitioned
inputs; any divergence means an implicit ordering assumption
(first/last/collect without explicit order) leaked into results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iotdatapipeline_spark.plans import QUERIES

ORDER_SENSITIVE = [
    "production_shift_rollup",   # lag windows + first/last merge
    "dedup_combine_parts",       # min_by/max_by merge rules
    "docs_minhash_lsh_pairs",    # min over shuffled shingles
    "config_regroup",            # collect_set/collect_list regroup
    "latest_snapshot",           # max_by last-write-wins
    "embeddings_kmeans",         # iterative argmin
    "parts_fuzzy_components",    # iterative min-label contraction
    "embeddings_pq_topk",        # per-subspace argmin + rank tie-breaks
    "docs_incremental_neardup",  # minhash over checkpointed shingles
    "docs_global_shuffle",       # row_number over hash order
    "docs_collocations",         # global lift ranking
    "events_type_transitions",   # lag window over per-user sequences
    "parts_cooccurrence_pagerank",  # iterative integer rank propagation
    "docs_prefix_filter_pairs",  # rarest-first prefix rank tie-breaks
    "docs_weighted_sample",      # global bottom-k priority draw
    "events_upsert_apply",       # max_by last-writer-wins
    "customers_rfm_scores",      # global ntile tie-breaks
    "docs_inverted_index",       # head-20 postings per term
    "events_merge_upsert_cow",   # COW merge + max_by latest per station
]


@pytest.mark.slow
class TestPartitioningIndependence:
    @pytest.mark.parametrize("name", ORDER_SENSITIVE)
    def test_results_stable_across_shuffle_layouts(self, spark, sf_small, name):
        base = QUERIES[name](spark, sf_small)
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        try:
            alt = QUERIES[name](spark, sf_small)
            # different shuffle fan-in AND a skewed repartition of the
            # plan's own output must agree exactly
            assert base.exceptAll(alt).count() == 0, name
            assert alt.exceptAll(base).count() == 0, name
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    def test_repartitioned_input_same_aggregate(self, spark, sf_small):
        from iotdatapipeline_spark.operators import dedup_combine
        from iotdatapipeline_spark.functions import expand_alternatives
        from iotdatapipeline_spark.sources import load_table

        ev = load_table(spark, sf_small, "events").select(
            F.col("user_id").alias("station"),
            F.col("event_id"),
            F.col("value"),
            F.floor(F.col("value") * 100).cast("long").alias("counter"),
            F.concat(F.col("event_type"), F.lit("/"), (F.col("user_id") % 3).cast("string")).alias("cadena"),
        ).withColumn("part_alts", expand_alternatives(F.col("cadena")))

        def run(df):
            return dedup_combine(
                df, keys=["station"], part_alts_col="part_alts", original_col="cadena",
                counter_col="counter", cycle_time_col="value", order_col="event_id",
            )

        a = run(ev)
        b = run(ev.repartition(7, "event_id"))  # scatter rows away from group keys
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


class TestDedupCombineTwoStage:
    def test_two_stage_matches_single_stage(self, spark):
        """The collect_counters=False fast path (stage-1 numeric compact
        by raw string, stage-2 string argmin over the compacted set)
        must match the single-stage formulation row for row, including
        duplicate raw strings and empty/slashless alternatives."""
        from pyspark.sql import Row, functions as F

        from iotdatapipeline_spark.operators import dedup_combine

        rows = [
            Row(station=1, cadena="A/B", counter=10, cyc=1.0, oid=1),
            Row(station=1, cadena="A/B", counter=20, cyc=2.0, oid=2),
            Row(station=1, cadena="B", counter=5, cyc=3.0, oid=3),
            Row(station=2, cadena="A", counter=7, cyc=4.0, oid=4),
            Row(station=2, cadena="C/", counter=9, cyc=5.0, oid=5),  # empty alt dropped
            Row(station=1, cadena="Z/B", counter=1, cyc=6.0, oid=6),
        ]
        df = spark.createDataFrame(rows)
        kw = dict(
            keys=["station"], raw_part_col="cadena", original_col="cadena",
            counter_col="counter", cycle_time_col="cyc", order_col="oid",
        )
        fast = dedup_combine(df, collect_counters=False, **kw)
        slow = dedup_combine(df, collect_counters=True, **kw).drop("counters")
        cols = ["station", "part", "counter_total", "n_readings", "part_original", "cycle_time"]
        assert sorted(map(tuple, fast.select(*cols).collect())) == sorted(
            map(tuple, slow.select(*cols).collect())
        )
        got = {(r["station"], r["part"]): r for r in fast.collect()}
        assert got[(1, "B")]["counter_total"] == 36  # A/B x2 + B + Z/B
        assert got[(1, "B")]["part_original"] == "A/B"  # min oid's raw string
        assert got[(1, "B")]["cycle_time"] == 6.0  # max oid's cycle time
        assert (2, "") not in got  # empty alternative filtered

    def test_stage1_is_hash_aggregate(self, spark):
        from pyspark.sql import Row

        from iotdatapipeline_spark.operators import dedup_combine

        df = spark.createDataFrame([Row(station=1, cadena="A/B", counter=1, cyc=1.0, oid=1)])
        out = dedup_combine(
            df, keys=["station"], raw_part_col="cadena", original_col="cadena",
            counter_col="counter", cycle_time_col="cyc", order_col="oid",
            collect_counters=False,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # stage 1 (pre-explode compact) must be hash; only the compacted
        # stage-2 string argmin may sort
        assert plan.count("HashAggregate") >= 2
