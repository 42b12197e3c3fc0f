"""Reaggregation / mergeable-summary registry: the "store partials,
merge on demand" pattern that carries a 100 TB warehouse — daily
partial aggregates that roll up to coarser grains WITHOUT rescanning
the raw fact, for both additive measures (exact) and distinct counts
(HLL sketch union).

The reference recomputes everything from the live stream each second
(Prensas.py :602-604) and keeps only the latest snapshot (K8) — it
has no reaggregation story at all; any historical question means a
full table scan.  These plans are the engine's answer: the daily
frame is what you'd persist as a rollup table, and the coarser query
reads |stations|×|days| rows instead of the fact.

`events_reaggregated_weekly` is oracle-paired: its two-level result
must hash-match DuckDB's direct one-level aggregation — the
commutativity proof that makes storing partials safe.
`station_distinct_users_hll` has no SQL oracle (sketch estimates are
engine-specific); its accuracy bound vs exact distinct is pinned in
tests/test_sketches.py instead, and the driver records the weaker
rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iotdatapipeline_spark.sources import load_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def daily_station_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persistable daily partial: per (station, day) additive
    measures.  At scale this is the rollup table a scheduler writes
    once per day; every coarser grain below derives from it."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("user_id").alias("station"), F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100)).cast("long").alias("day_cents"),
        F.count(F.lit(1)).alias("day_n"),
    )


@register(
    "events_reaggregated_weekly",
    """
    SELECT user_id AS station,
           CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS week_cents,
           count(*) AS week_n
    FROM events
    GROUP BY 1, 2
    """,
)
def events_reaggregated_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly totals computed by MERGING daily partials (two-level
    aggregation), hash-checked against the oracle's direct
    weekly-from-raw aggregation.  Equality holds because sum/count
    are commutative monoids — the property that lets a 100 TB
    deployment answer month/quarter/year queries from the daily
    rollup table at 1/10000th the scan cost.  The second level
    groups on a strict coarsening of (station, day), so AQE executes
    it as a near-local merge on the first shuffle's partitioning."""
    daily = daily_station_rollup(spark, sf_dir)
    return daily.groupBy(
        "station", F.date_trunc("week", F.col("day")).cast("date").alias("week")
    ).agg(
        F.sum("day_cents").cast("long").alias("week_cents"),
        F.sum("day_n").alias("week_n"),
    )


@register("station_distinct_users_hll", None)
def station_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type over the whole span, computed by
    UNIONING per-day HLL sketches — distinct counts made mergeable.
    Exact distinct does not reaggregate (you cannot sum daily
    distincts), which at 100 TB forces either a full rescan per query
    or sketches; `hll_sketch_agg` partials stored daily + `
    hll_union_agg` at query time give ~2% standard error at any
    cardinality with a few KB per cell.  No SQL oracle — sketch
    binaries are engine-specific; the estimate's error vs exact
    countDistinct is bounded in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    daily_sk = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("day_n"),
    )
    return daily_sk.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.sum("day_n").alias("n_events"),
    )


@register("cycle_time_approx_percentiles", None)
def cycle_time_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-station percentiles via the KLL-style approx sketch
    (``percentile_approx``, accuracy 1000) — the 100 TB path for
    ``cycle_time_percentiles``: exact percentiles need every group's
    values sorted together, while the sketch is mergeable map-side
    partial state like any other aggregate. No SQL oracle — sketch
    outputs are algorithm-specific; the approximation error against
    the exact percentile is bounded in tests/test_plans.py
    (TestApproxDistinct), the same policy as the HLL entry above."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx(F.col("value"), F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(1000))
    return ev.groupBy(F.col("user_id").alias("station")).agg(pct.alias("__p")).select(
        "station",
        F.floor(F.col("__p")[0] * 1000).cast("long").alias("p50_x1000"),
        F.floor(F.col("__p")[1] * 1000).cast("long").alias("p95_x1000"),
        F.floor(F.col("__p")[2] * 1000).cast("long").alias("p99_x1000"),
    )
