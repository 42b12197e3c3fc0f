"""Gate tests for the reaggregation registry (plans/sketches.py):
the HLL sketch-union accuracy bound (its stand-in for a SQL oracle)
and the partial-merge identities of the additive rollup.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from iotdatapipeline_spark.plans import ORACLE, QUERIES
from iotdatapipeline_spark.sources import load_table


class TestRegistry:
    def test_every_sketch_is_oracled(self):
        # r5: every sketch is md5/integer-reproducible, so even the
        # estimators carry hard DuckDB oracles (no rows-only rows left)
        assert "events_reaggregated_weekly" in ORACLE
        assert "station_distinct_users_hll" in ORACLE
        assert "cycle_time_approx_percentiles" in ORACLE


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

    def test_kmv_exact_below_k(self, spark, sf_small):
        # below k=64 distinct the KMV sketch degenerates to the exact
        # count — sf0.001 has 15 users/type, so equality must hold
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
        assert approx == exact

    def test_kmv_union_estimate_within_bound(self, spark, sf_oracle):
        # estimator path (150 users/type > k=64): KMV standard error is
        # ~1/sqrt(k-2) ≈ 12.7%; assert a 3σ band. All types share one
        # user population, so errors are correlated — one band check
        # per type is still k independent order statistics per sketch.
        approx = {
            r["event_type"]: r["approx_users"]
            for r in QUERIES["station_distinct_users_hll"](spark, sf_oracle).collect()
        }
        ev = load_table(spark, sf_oracle, "events")
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert set(approx) == set(exact)
        for et, n in exact.items():
            assert n > 64  # estimator actually engaged
            assert abs(approx[et] - n) <= 0.40 * n, (et, approx[et], n)

    def test_hll_event_totals_survive_rollup(self, spark, sf_small):
        # the additive companion column must still be exact
        df = QUERIES["station_distinct_users_hll"](spark, sf_small)
        total = df.agg(F.sum("n_events")).collect()[0][0]
        assert total == load_table(spark, sf_small, "events").count()


class TestCountMin:
    def test_registered_with_oracle(self):
        from iotdatapipeline_spark.plans import ORACLE, QUERIES

        assert "events_cms_station_counts" in QUERIES
        assert "events_cms_station_counts" in ORACLE

    def test_one_sided_guarantee_and_tight_at_this_width(self, spark, sf_small):
        from iotdatapipeline_spark.plans import QUERIES
        from pyspark.sql import functions as F

        df = QUERIES["events_cms_station_counts"](spark, sf_small)
        # CMS never undercounts
        assert df.filter(F.col("overcount") < 0).count() == 0
        # at width 256 vs ~150 stations, most cells are collision-free:
        # the median overcount must be zero and the estimate exact for
        # a majority of stations
        n = df.count()
        exact_n = df.filter(F.col("overcount") == 0).count()
        assert exact_n > n / 2, (exact_n, n)

    def test_sketch_is_fixed_size(self, spark, sf_small):
        # the sketch table itself can never exceed depth*width cells
        from iotdatapipeline_spark.plans import QUERIES

        # re-derive the internal sketch: build-side cells ≤ 3*256
        from iotdatapipeline_spark.sources import load_table
        from pyspark.sql import functions as F

        ev = load_table(spark, sf_small, "events")
        key = F.col("user_id").cast("string")
        width = 256
        cells = ev.select(
            F.explode(
                F.array(
                    *[
                        F.conv(
                            F.substring(F.md5(F.concat(F.lit(f"{d}|"), key)), 1, 8), 16, 10
                        ).cast("long") % width
                        + d * width
                        for d in range(3)
                    ]
                )
            ).alias("cell_id")
        )
        assert cells.distinct().count() <= 3 * 256


class TestBitmapDistinct:
    def test_bitmap_equals_exact_distinct(self, spark, sf_small):
        from iotdatapipeline_spark.sources import load_table
        from pyspark.sql import functions as F

        got = {
            (r.event_type): r.distinct_users
            for r in QUERIES["events_bitmap_distinct_users"](spark, sf_small).collect()
        }
        want = {
            (r.event_type): r.d
            for r in load_table(spark, sf_small, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("d"))
            .collect()
        }
        assert got == want


class TestSourceMinhashOverlap:
    def test_estimates_bounded_and_symmetric_free(self, spark, sf_small):
        rows = QUERIES["sources_minhash_overlap"](spark, sf_small).collect()
        assert rows
        seen = set()
        for r in rows:
            assert r.source1 < r.source2  # upper triangle only
            assert 0 <= r.matches <= 8
            assert r.jaccard_est_x1000 == 1000 * r.matches // 8
            seen.add((r.source1, r.source2))
        assert len(seen) == len(rows)  # no duplicate pairs


class TestMisraGries:
    def test_fold_never_undercounts_beyond_bound(self):
        """Single-table property: after folding a stream of (value,
        count) mass n through capacity c, every key's undercount is
        <= n/(c+1) and survivors with true freq > n/(c+1) remain."""
        import random

        from iotdatapipeline_spark.plans.sketches import _mg_fold

        rng = random.Random(11)
        cap = 10
        truth: dict = {}
        counters: dict = {}
        # Zipf-ish stream: a few hot keys + a long tail
        stream = []
        for i in range(4000):
            v = f"hot{i % 3}" if rng.random() < 0.5 else f"cold{rng.randrange(500)}"
            stream.append(v)
        for v in stream:
            truth[v] = truth.get(v, 0) + 1
            _mg_fold(counters, v, 1, cap)
        n = len(stream)
        assert len(counters) <= cap
        for v, c in counters.items():
            assert c <= truth[v]  # MG never overcounts
            assert truth[v] - c <= n // (cap + 1) + 1
        for v, t in truth.items():
            if t > n / (cap + 1):
                assert v in counters, f"guaranteed heavy key {v} evicted"

    def test_fold_batched_equals_unit_guarantee(self):
        """Folding pre-counted batches keeps the survivor guarantee
        (decrement rounds remove capacity+1 mass per round)."""
        from iotdatapipeline_spark.plans.sketches import _mg_fold

        cap = 4
        counters: dict = {}
        batched = [("a", 50), ("b", 7), ("c", 6), ("d", 5), ("e", 4), ("f", 3), ("a", 25)]
        n = sum(c for _, c in batched)
        for v, c in batched:
            _mg_fold(counters, v, c, cap)
        assert len(counters) <= cap
        assert "a" in counters  # freq 75 >> n/(cap+1)=20
        assert counters["a"] <= 75

    def test_candidates_superset_of_true_heavy_hitters(self, spark, sf_small):
        """Distributed guarantee: the union of per-partition MG
        summaries contains every key with global share > 1/capacity,
        regardless of partitioning."""
        from iotdatapipeline_spark.plans.sketches import misra_gries_partials

        ev = load_table(spark, sf_small, "events").repartition(7)
        key = F.concat(F.lit("k"), (F.col("user_id") % 12).cast("string"))
        df = ev.select(key.alias("v"))
        cap = 30
        cand = {r["value"] for r in misra_gries_partials(df, "v", cap).collect()}
        n = df.count()
        exact = {
            r["v"]: r["c"]
            for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        for v, c in exact.items():
            if c > n / cap:
                assert v in cand

    def test_gate_matches_exact_group_by(self, spark, sf_small):
        got = {
            (r["value"], r["cnt"])
            for r in QUERIES["events_heavy_hitters"](spark, sf_small).collect()
        }
        ev = load_table(spark, sf_small, "events")
        key = F.when(
            F.col("event_id") % 3 == 0, F.concat(F.lit("hot-"), F.col("event_type"))
        ).otherwise(F.concat(F.lit("cold-"), F.col("user_id").cast("string")))
        cnts = ev.select(key.alias("v")).groupBy("v").agg(F.count(F.lit(1)).alias("c"))
        n = ev.count()
        want = {(r["v"], r["c"]) for r in cnts.collect() if r["c"] >= 0.03 * n}
        assert got == want and got

    def test_exact_boundary_share_is_not_missed(self, spark):
        """r11 ADVICE (low): freqItems' no-false-negative guarantee is
        for frequencies STRICTLY above the support, but heavy_hitters'
        verify filter (and the oracle) use >=. A key sitting at EXACTLY
        min_share*n must still be reported — the candidate probe runs
        slightly below min_share to guarantee it."""
        from iotdatapipeline_spark.plans.sketches import heavy_hitters

        # 100 rows: 'edge' exactly 5x (share == min_share == 0.05),
        # 'heavy' 10x, the rest 85 distinct cold keys
        df = spark.range(100).select(
            F.when(F.col("id") < 5, F.lit("edge"))
            .when(F.col("id") < 15, F.lit("heavy"))
            .otherwise(F.concat(F.lit("c"), F.col("id")))
            .alias("v")
        )
        got = {(r["value"], r["cnt"]) for r in heavy_hitters(df, "v", 0.05).collect()}
        assert got == {("edge", 5), ("heavy", 10)}

    def test_min_share_below_probe_floor_refused(self, spark):
        """r11 review: a silent clamp to freqItems' 1e-4 support floor
        would quietly re-lose the boundary guarantee for tiny shares —
        refuse loudly instead."""
        from iotdatapipeline_spark.plans.sketches import heavy_hitters

        df = spark.range(10).select(F.col("id").cast("string").alias("v"))
        with pytest.raises(ValueError, match="min_share"):
            heavy_hitters(df, "v", min_share=5e-5)
