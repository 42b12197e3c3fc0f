"""VERDICT r13 item 9: production_shift_rollup's multiplier dim is a
second events scan + distinct (~0.106 s of 0.46). Variant: roll up with
multiplier=None and derive the dim from the rollup's OWN output parts
(same broadcast left join + default-1 — J10/C8 preserved), so the
events table is scanned once if the window/agg exchanges are reused.
Usage:

    python tools/bench_shift_mult_ab.py <sf_dir> [--reps N] [--plans]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.operators import production_rollup
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.plans.core import _readings
from tools.bench_q3_shootout import interleaved_ab


def folded_variant(spark, sf_dir):
    readings = _readings(spark, sf_dir)
    out = production_rollup(
        readings,
        station_col="station",
        part_col="part",
        counter_col="counter",
        ts_col="ts",
        order_cols=("event_id",),
        multiplier=None,
    ).drop("qty")
    # dim from the rollup's own parts: every part in the output came
    # from events, and parts absent from the output cannot affect a
    # LEFT join — so this is result-identical to the events-distinct dim
    dim = (
        out.select("part")
        .distinct()
        .filter(F.length("part") != 5)
        .withColumn("multiplier", (F.length("part") % 3 + 1).cast("int"))
    )
    j = out.join(F.broadcast(dim), "part", "left")
    q = (F.col("qty_raw") * F.coalesce(F.col("multiplier"), F.lit(1))).cast("long")
    return j.withColumn("qty", q).select(
        "station", "part", "plan_date", "shift_id", "emit_count", "last_counter", "qty"
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("shift-mult-ab")
    spark.sparkContext.setLogLevel("ERROR")
    _small = "/testdata/" in sf_dir
    spark.conf.set("spark.sql.shuffle.partitions", "8" if _small else os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.adaptive.enabled", "false" if _small else "true")

    cur = QUERIES["production_shift_rollup"](spark, sf_dir)
    fold = folded_variant(spark, sf_dir)
    if "--plans" in sys.argv:
        for name, df in (("current", cur), ("folded", fold)):
            p = df._jdf.queryExecution().executedPlan().toString()
            print(name, "scans:", p.count("FileScan"), "exchanges:", p.count("Exchange") - p.count("BroadcastExchange"), "reused:", p.count("ReusedExchange"))
    da, db = fold.exceptAll(cur).count(), cur.exceptAll(fold).count()
    print("exceptAll", da, db)
    assert da == 0 and db == 0
    assert fold.schema == cur.schema, (fold.schema, cur.schema)

    run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())  # noqa: E731
    interleaved_ab("events-scan dim", run(cur), "own-parts dim  ", run(fold), reps=reps)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
