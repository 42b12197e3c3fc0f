"""Gate tests for the time-series registry (plans/timeseries.py):
plan-shape pins plus the grid/partition invariants the value-hash
oracle can't state directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iotdatapipeline_spark.plans import ORACLE, QUERIES
from iotdatapipeline_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestRegistry:
    def test_all_registered_with_oracles(self):
        for name in (
            "events_hourly_gapfill",
            "events_status_islands",
            "events_trailing_hour_range",
        ):
            assert name in QUERIES and name in ORACLE, name


class TestPlanShapes:
    def test_gapfill_top1_pushes_partial_limit_before_shuffle(self, spark, sf_small):
        # the hourly "last reading" row_number()=1 must trigger
        # WindowGroupLimit: each map task keeps one row per (station,
        # hour) BEFORE the exchange — at 100 TB that's the difference
        # between shuffling every event and shuffling one row per cell
        plan = _plan(QUERIES["events_hourly_gapfill"](spark, sf_small))
        assert "WindowGroupLimit" in plan, plan
        # the 1-row bounds frame rides a broadcast nested-loop cross,
        # never a real cartesian
        assert plan.count("BroadcastNestedLoopJoin") == 1, plan
        assert "CartesianProduct" not in plan, plan

    def test_islands_single_shuffle(self, spark, sf_small):
        # lag + running-sum share one station-hash exchange and the
        # final (station, type, run) groupBy rides it as a partial agg
        plan = _plan(QUERIES["events_status_islands"](spark, sf_small))
        assert plan.count("Exchange") == 1, plan

    def test_trailing_range_single_window_single_shuffle(self, spark, sf_small):
        plan = _plan(QUERIES["events_trailing_hour_range"](spark, sf_small))
        assert plan.count("Exchange") == 1, plan
        assert plan.count("windowspecdefinition") >= 1, plan
        assert "SortMergeJoin" not in plan, plan


class TestInvariants:
    def test_gapfill_grid_is_complete(self, spark, sf_small):
        # exactly |stations| × |hours in global span| rows — a regular
        # grid, no dropped silent hours, no duplicated cells
        df = QUERIES["events_hourly_gapfill"](spark, sf_small)
        ev = load_table(spark, sf_small, "events")
        n_stations = ev.select("user_id").distinct().count()
        b = ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        ).collect()[0]
        n_hours = int((b["h1"] - b["h0"]).total_seconds() // 3600) + 1
        assert df.count() == n_stations * n_hours
        assert df.select("station", "hour_ts").distinct().count() == n_stations * n_hours

    def test_gapfill_fill_never_invents_values(self, spark, sf_small):
        # every non-null filled value must be a value that station
        # actually observed (forward-fill carries, never fabricates)
        df = QUERIES["events_hourly_gapfill"](spark, sf_small)
        ev = load_table(spark, sf_small, "events").select(
            F.col("user_id").alias("station"),
            F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
        )
        extra = (
            df.filter(F.col("v_cents").isNotNull())
            .select("station", "v_cents")
            .join(ev, ["station", "v_cents"], "left_anti")
        )
        assert extra.count() == 0

    def test_islands_partition_all_events(self, spark, sf_small):
        # runs partition the event log: Σ n_obs == |events|
        df = QUERIES["events_status_islands"](spark, sf_small)
        total = df.agg(F.sum("n_obs")).collect()[0][0]
        assert total == load_table(spark, sf_small, "events").count()

    def test_islands_runs_do_not_overlap_in_time(self, spark, sf_small):
        # within a station, ordering runs by valid_from must give
        # non-overlapping intervals (valid_to < next valid_from)
        df = QUERIES["events_status_islands"](spark, sf_small)
        from pyspark.sql import Window

        w = Window.partitionBy("station").orderBy("valid_from")
        bad = df.withColumn("nxt", F.lead("valid_from").over(w)).filter(
            F.col("nxt").isNotNull() & (F.col("valid_to") >= F.col("nxt"))
        )
        assert bad.count() == 0


class TestInterpolate:
    def test_registered_with_oracle(self):
        assert "events_hourly_interpolate" in QUERIES
        assert "events_hourly_interpolate" in ORACLE

    def test_plan_shape(self, spark, sf_small):
        # same scale shape as gapfill: grid-cell top-1 limited before
        # the shuffle, 1-row bounds on a broadcast nested loop, and the
        # two ignore-nulls fill passes must NOT add an extra exchange
        plan = _plan(QUERIES["events_hourly_interpolate"](spark, sf_small))
        assert "WindowGroupLimit" in plan, plan
        assert plan.count("BroadcastNestedLoopJoin") == 1, plan
        assert "CartesianProduct" not in plan, plan

    def test_observed_cells_keep_observed_value(self, spark, sf_small):
        # every grid cell with a real observation must carry it verbatim
        interp = QUERIES["events_hourly_interpolate"](spark, sf_small)
        ffill = QUERIES["events_hourly_gapfill"](spark, sf_small)
        ev = load_table(spark, sf_small, "events")
        from pyspark.sql import Window

        w = Window.partitionBy("station", "h").orderBy(F.desc("ts"), F.desc("event_id"))
        obs = (
            ev.select(
                F.col("user_id").alias("station"),
                F.date_trunc("hour", F.col("ts")).alias("h"),
                "ts",
                "event_id",
                F.floor(F.col("value") * 100).cast("long").alias("obs_cents"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        bad = (
            interp.join(obs, (interp["station"] == obs["station"]) & (interp["hour_ts"] == obs["h"]))
            .filter(F.col("v_cents") != F.col("obs_cents"))
        )
        assert bad.count() == 0
        # and the grids agree cell-for-cell on which rows exist
        assert interp.count() == ffill.count()

    def test_interpolated_values_bounded_by_neighbors(self, spark, sf_small):
        # linear interpolation can never overshoot: every filled value
        # lies within [min(prev, next), max(prev, next)] — checked
        # globally via per-station observed min/max
        df = QUERIES["events_hourly_interpolate"](spark, sf_small)
        ev = load_table(spark, sf_small, "events").select(
            F.col("user_id").alias("station"),
            F.floor(F.col("value") * 100).cast("long").alias("v"),
        )
        rng = ev.groupBy("station").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        bad = (
            df.filter(F.col("v_cents").isNotNull())
            .join(rng, "station")
            .filter((F.col("v_cents") < F.col("lo")) | (F.col("v_cents") > F.col("hi")))
        )
        assert bad.count() == 0

    def test_null_only_outside_observed_span(self, spark, sf_small):
        # interior cells are always filled: a NULL may appear only
        # before a station's first observation or after its last
        df = QUERIES["events_hourly_interpolate"](spark, sf_small)
        ev = load_table(spark, sf_small, "events").select(
            F.col("user_id").alias("station"),
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        span = ev.groupBy("station").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        bad = (
            df.filter(F.col("v_cents").isNull())
            .join(span, "station")
            .filter((F.col("hour_ts") >= F.col("h0")) & (F.col("hour_ts") <= F.col("h1")))
        )
        assert bad.count() == 0


class TestEwma:
    def test_registered_with_oracle(self):
        assert "events_ewma_smooth" in QUERIES
        assert "events_ewma_smooth" in ORACLE

    def test_single_window_single_shuffle(self, spark, sf_small):
        # all five lags must collapse into ONE window pass on one
        # station-hash exchange
        plan = _plan(QUERIES["events_ewma_smooth"](spark, sf_small))
        assert plan.count("Exchange") == 1, plan
        assert plan.count("Window") == 1, plan

    def test_smoothing_bounded_and_warmup_exact(self, spark, sf_small):
        df = QUERIES["events_ewma_smooth"](spark, sf_small)
        ev = load_table(spark, sf_small, "events")
        assert df.count() == ev.count()
        # smoothed value lies within each station's observed range
        rng = ev.groupBy(F.col("user_id").alias("station")).agg(
            F.min(F.floor(F.col("value") * 100).cast("long")).alias("lo"),
            F.max(F.floor(F.col("value") * 100).cast("long")).alias("hi"),
        )
        bad = df.join(rng, "station").filter(
            (F.col("ewma_cents") < F.col("lo")) | (F.col("ewma_cents") > F.col("hi"))
        )
        assert bad.count() == 0
        # a station's FIRST reading must smooth to exactly itself
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        first = (
            ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("user_id").alias("station"),
                "event_id",
                F.floor(F.col("value") * 100).cast("long").alias("expect"),
            )
        )
        diff = df.join(first, ["station", "event_id"]).filter(
            F.col("ewma_cents") != F.col("expect")
        )
        assert diff.count() == 0


class TestIslandsIncremental:
    def test_registered_with_oracle(self):
        assert "events_islands_incremental" in QUERIES
        assert "events_islands_incremental" in ORACLE

    def test_merge_of_three_slices_equals_direct(self, spark, sf_small):
        # associativity: 3 time slices, folded left, must equal the
        # single-pass collapse over the full log
        from iotdatapipeline_spark.operators.timeseries import (
            collapse_islands,
            merge_islands,
        )

        ev = (
            load_table(spark, sf_small, "events")
            .select(
                F.col("user_id").alias("station"), "ts", "event_id", "event_type"
            )
        )
        cut1 = F.lit("2024-01-11").cast("timestamp")
        cut2 = F.lit("2024-01-21").cast("timestamp")
        slices = [
            ev.filter(F.col("ts") < cut1),
            ev.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2)),
            ev.filter(F.col("ts") >= cut2),
        ]
        parts = [collapse_islands(s) for s in slices]
        merged = merge_islands(merge_islands(parts[0], parts[1]), parts[2])
        direct = collapse_islands(ev).select(
            "station", "event_type", "run_id", "valid_from", "valid_to", "n_obs"
        )
        m = merged.select(
            "station", "event_type", "run_id", "valid_from", "valid_to", "n_obs"
        )
        assert m.exceptAll(direct).count() == 0
        assert direct.exceptAll(m).count() == 0

    def test_boundary_run_fuses(self, spark):
        # a run continuing across the slice boundary must come back as
        # ONE run with summed observations
        from iotdatapipeline_spark.operators.timeseries import (
            collapse_islands,
            merge_islands,
        )
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base + dt.timedelta(hours=h), h, s)
            for h, s in enumerate(["a", "a", "b", "b", "b", "a"])
        ]
        df = spark.createDataFrame(
            rows, "station int, ts timestamp, event_id int, event_type string"
        )
        prior = collapse_islands(df.filter(F.col("event_id") < 3))
        delta = collapse_islands(df.filter(F.col("event_id") >= 3))
        got = sorted(
            (r["run_id"], r["event_type"], r["n_obs"])
            for r in merge_islands(prior, delta).collect()
        )
        # b-run spans the boundary: runs are a(2), b(3), a(1)
        assert got == [(1, "a", 2), (2, "b", 3), (3, "a", 1)]


class TestCusum:
    def test_registered_with_oracle(self):
        assert "events_cusum_drift" in QUERIES
        assert "events_cusum_drift" in ORACLE

    def test_plan_shape_single_exchange(self, spark, sf_small):
        # both window passes (running sum, then running min over it)
        # share the (station, ts, event_id) sort order — one exchange,
        # one sort, two Window operators stacked on the same partitioning
        plan = _plan(QUERIES["events_cusum_drift"](spark, sf_small))
        assert plan.count("Exchange") == 1, plan

    def test_recurrence_equivalence(self, spark, sf_small):
        # closed form == the stateful recurrence S_i = max(0, S_{i-1}+d)
        rows = QUERIES["events_cusum_drift"](spark, sf_small).collect()
        from iotdatapipeline_spark.sources import load_table
        import collections

        ev = (
            load_table(spark, sf_small, "events")
            .selectExpr("user_id AS station", "ts", "event_id",
                        "CAST(floor(value * 100) AS BIGINT) - 50 AS d")
            .orderBy("station", "ts", "event_id")
            .collect()
        )
        state: dict = collections.defaultdict(int)
        want = {}
        for r in ev:
            state[r.station] = max(0, state[r.station] + r.d)
            want[(r.station, r.event_id)] = state[r.station]
        got = {(r.station, r.event_id): r.cusum for r in rows}
        assert got == want


class TestRobustStats:
    def test_registered_with_oracle(self):
        for n in ("events_winsorized_stats", "events_mad_outliers"):
            assert n in QUERIES and n in ORACLE

    def test_winsorized_invariants(self, spark, sf_small):
        rows = QUERIES["events_winsorized_stats"](spark, sf_small).collect()
        assert rows
        for r in rows:
            assert r.p05_cents <= r.p95_cents
            # winsorized mean must land inside the clamp band
            assert r.p05_cents <= r.winsorized_mean_cents <= r.p95_cents
            # ≤5% of rows clamped on each side (rank-based cut points)
            assert r.n_clamped_low <= r.n * 5 // 100 + 1
            assert r.n_clamped_high <= r.n * 5 // 100 + 1

    def test_mad_python_recurrence(self, spark, sf_small):
        # lower-median / MAD recomputed row-at-a-time in Python
        from iotdatapipeline_spark.sources import load_table
        import collections

        ev = (
            load_table(spark, sf_small, "events")
            .selectExpr("user_id AS station", "event_id",
                        "CAST(floor(value * 100) AS BIGINT) AS v")
            .collect()
        )
        by_st = collections.defaultdict(list)
        for r in ev:
            by_st[r.station].append((r.v, r.event_id))

        def lower_median(vals):
            s = sorted(vals)
            return s[(len(s) + 1) // 2 - 1]

        want = set()
        for st, pairs in by_st.items():
            med = lower_median(pairs)[0]
            mad = lower_median([(abs(v - med), e) for v, e in pairs])[0]
            if mad <= 0:
                continue
            for v, e in pairs:
                if 6745 * abs(v - med) > 35000 * mad:
                    want.add((st, e))
        got = {(r.station, r.event_id) for r in QUERIES["events_mad_outliers"](spark, sf_small).collect()}
        assert got == want
