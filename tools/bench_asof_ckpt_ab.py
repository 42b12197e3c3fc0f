"""A/B for VERDICT r13 item 5: events_asof_config computes its
``unified`` (probe ∪ build) subtree once per consumer (per-bucket agg,
spine, final window pass). Is a localCheckpoint'ed unified faster, or
does the lazy form win because the narrow consumers column-prune /
constant-fold their branches? Usage:

    python tools/bench_asof_ckpt_ab.py <sf_dir> [--reps N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import Window
from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab

_SIDE = "__asof_side"
_BKT = "__asof_bucket"
_VALS = "__asof_vals"
_CARRY = "__asof_carry"


def ckpt_variant(spark, sf_dir):
    """events_asof_config with the asof_join bucketed path inlined and
    ``unified`` localCheckpoint'ed (lazy) so the three consumers share
    one materialization instead of re-deriving the union."""
    ev = load_table(spark, sf_dir, "events")
    readings = ev.select(
        F.col("user_id").alias("station"),
        F.col("ts"),
        F.col("event_id"),
        F.floor(F.col("value") * 100).cast("long").alias("counter"),
    )
    cfg = (
        readings.filter(F.col("event_id") % 17 == 0)
        .groupBy("station", "ts")
        .agg(F.max("counter").alias("version"))
    )
    on = ["station"]
    ts_col = "ts"
    value_cols = ["version"]
    probe, build = readings, cfg
    build_types = {f.name: f.dataType for f in build.schema.fields}
    probe_types = {f.name: f.dataType for f in probe.schema.fields}
    probe_only = [c for c in probe.columns if c not in on and c != ts_col]
    probe_side = probe.withColumns(
        {c: F.lit(None).cast(build_types[c]) for c in value_cols} | {_SIDE: F.lit(1)}
    )
    build_side = build.select(*on, ts_col, *value_cols).withColumns(
        {c: F.lit(None).cast(probe_types[c]) for c in probe_only} | {_SIDE: F.lit(0)}
    )
    unified = probe_side.unionByName(build_side.select(*probe_side.columns))
    unified = unified.withColumn(_BKT, F.date_trunc("hour", F.col("ts")))
    unified = unified.localCheckpoint(eager=False)

    per_bucket = (
        unified.filter(F.col(_SIDE) == 0)
        .groupBy(*on, _BKT)
        .agg(F.max_by(F.struct(*value_cols), F.col(ts_col)).alias(_VALS))
    )
    spine = unified.select(*on, _BKT).distinct()
    wb = Window.partitionBy(*on).orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        spine.join(per_bucket, on + [_BKT], "left")
        .withColumn(_CARRY, F.last(_VALS, ignorenulls=True).over(wb))
        .filter(F.col(_CARRY).isNotNull())
    )
    carry_rows = carry.select(
        *on,
        F.lit(None).cast(probe_types[ts_col]).alias(ts_col),
        *[F.col(_CARRY)[c].alias(c) for c in value_cols],
        *[F.lit(None).cast(probe_types[c]).alias(c) for c in probe_only],
        F.lit(-1).alias(_SIDE),
        F.col(_BKT),
    )
    w2 = (
        Window.partitionBy(*on, _BKT)
        .orderBy(F.asc_nulls_first(ts_col), _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unified.unionByName(carry_rows.select(*unified.columns)).withColumns(
        {c: F.last(c, ignorenulls=True).over(w2) for c in value_cols}
    )
    joined = filled.filter(F.col(_SIDE) == 1).drop(_SIDE, _BKT)
    return joined.select(
        "station",
        "event_id",
        "counter",
        F.coalesce(F.col("version"), F.lit(-1)).cast("long").alias("cfg_version"),
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("asof-ckpt-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))

    cur = QUERIES["events_asof_config"](spark, sf_dir)
    ck = ckpt_variant(spark, sf_dir)
    da, db = ck.exceptAll(cur).count(), cur.exceptAll(ck).count()
    print("exceptAll", da, db)
    assert da == 0 and db == 0

    def run_cur():
        QUERIES["events_asof_config"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run_ck():
        # rebuild per rep: a checkpointed frame caches its RDD, and
        # timing a second pass over it would be result-caching, not a
        # measurement of the query
        ckpt_variant(spark, sf_dir).write.format("noop").mode("overwrite").save()

    interleaved_ab("lazy x3 unified", run_cur, "localCheckpoint", run_ck, reps=reps)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
