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

from pyspark.sql import DataFrame, SparkSession, Window
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


def _cms_sql(depth: int = 3, width: int = 256) -> str:
    pos = lambda d, key: f"(('0x' || substr(md5('{d}|' || {key}), 1, 8))::BIGINT % {width})"  # noqa: E731
    build_rows = " UNION ALL ".join(
        f"SELECT {d} AS row_id, {pos(d, 'CAST(user_id AS VARCHAR)')} AS col_id, "
        f"count(*) AS c FROM events GROUP BY col_id"
        for d in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT user_id, {d} AS row_id, {pos(d, 'CAST(user_id AS VARCHAR)')} AS col_id "
        f"FROM (SELECT DISTINCT user_id FROM events)"
        for d in range(depth)
    )
    return f"""
    WITH cms AS (
        SELECT row_id, col_id, CAST(sum(c) AS BIGINT) AS cell
        FROM ({build_rows}) GROUP BY row_id, col_id
    ),
    probe AS ({probe_rows}),
    est AS (
        SELECT probe.user_id, min(cms.cell) AS est_count
        FROM probe JOIN cms USING (row_id, col_id)
        GROUP BY probe.user_id
    ),
    exact AS (SELECT user_id, count(*) AS exact_count FROM events GROUP BY user_id)
    SELECT est.user_id AS station,
           CAST(est.est_count AS BIGINT) AS est_count,
           CAST(exact.exact_count AS BIGINT) AS exact_count,
           CAST(est.est_count - exact.exact_count AS BIGINT) AS overcount
    FROM est JOIN exact USING (user_id)
    """


@register("events_cms_station_counts", _cms_sql())
def events_cms_station_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (depth 3 × width 256) of per-station event
    counts, audited against the exact answer: est ≥ exact always (the
    CMS one-sided guarantee), with the overcount column showing the
    collision cost. The mergeable fixed-memory frequency summary —
    at 100 TB the sketch is depth×width cells no matter how many
    events flow through, partials merge by cell-wise addition across
    days/partitions (same property the oracle proves for the HLL and
    rollup queries above), and heavy hitters fall out of a probe.

    Exact-integer md5 column hashing (same construction as
    operators/bloom.py) keeps the sketch engine-reproducible — a
    DuckDB oracle can rebuild it cell-for-cell, which no native
    engine-internal sketch allows.

    Scale shape (one-pass, no row expansion): because the sketch key
    IS the station, every event of a station lands in the SAME cell
    per row, so cell(d, c) = Σ exact_count over stations hashing to c
    at row d — the per-station count (already needed as the audit
    side) doubles as the CMS add-weight.  The fact is scanned ONCE
    (the partial-agg'd station groupBy); the depth hash columns and
    the three cell sums are window aggregates over the tiny
    post-aggregation station table, so no explode (the r2 plan
    tripled fact rows before combine — 9.6× vs DuckDB at sf0.1), no
    joins, and the only fact-sized cost is the single count shuffle.
    At 100 TB: one shuffle of the fact on station, then depth
    shuffles of |stations| rows."""
    ev = load_table(spark, sf_dir, "events")
    depth, width = 3, 256
    key = F.col("user_id").cast("string")

    def pos(d: int) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{d}|"), key)), 1, 8), 16, 10
        ).cast("long") % width

    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    withpos = counts.select(
        "user_id", "exact_count", *[pos(d).alias(f"__c{d}") for d in range(depth)]
    )
    for d in range(depth):
        withpos = withpos.withColumn(
            f"__cell{d}", F.sum("exact_count").over(Window.partitionBy(f"__c{d}"))
        )
    est = F.least(*[F.col(f"__cell{d}") for d in range(depth)])
    return withpos.select(
        F.col("user_id").alias("station"),
        est.cast("long").alias("est_count"),
        "exact_count",
        (est - F.col("exact_count")).cast("long").alias("overcount"),
    )


@register(
    "events_bitmap_distinct_users",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events GROUP BY event_type
    """,
)
def events_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event_type from MERGEABLE partials:
    the roaring-bitmap pattern on 64-bit words.  Each (event_type,
    day, user_id div 64) cell stores one long whose set bits are the
    users seen in that 64-id bucket; `bit_or` is a commutative,
    idempotent monoid, so daily words merge into the total without
    rescanning the fact — the property HLL buys with ~2% error
    (station_distinct_users_hll), bought here exactly at the cost of
    id-space-proportional state.  The oracle is the DIRECT
    count(DISTINCT user_id): equality proves the partials are lossless.

    Scale shape: the first groupBy keys on (type, day, bucket) —
    partial-aggregated map-side, so the shuffle carries at most one
    long per populated bucket per day per type; the merge groupBy is a
    strict coarsening (AQE keeps it near-local); the final count is
    sum(bit_count(word)).  At 100 TB the bucket key partitions the id
    space evenly regardless of user skew — a hot user sets one bit."""
    ev = load_table(spark, sf_dir, "events")
    daily_words = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        # integer FLOOR-division paired with pmod: exact over the full
        # bigint domain (float division loses exactness above 2^53,
        # and truncate-toward-zero div with pmod collides -1 with 63;
        # user_id - pmod is 64-aligned, so the truncating div IS the
        # floor, and the subtraction cannot underflow because bigint
        # min is itself 64-aligned)
        F.expr("(user_id - pmod(user_id, 64)) div 64").alias("bucket"),
    ).agg(
        F.bit_or(F.expr("shiftleft(cast(1 as bigint), cast(pmod(user_id, 64) as int))")).alias(
            "word"
        )
    )
    merged = daily_words.groupBy("event_type", "bucket").agg(F.bit_or("word").alias("word"))
    return merged.groupBy("event_type").agg(
        F.sum(F.bit_count("word")).cast("long").alias("distinct_users")
    )
