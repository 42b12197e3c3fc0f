"Interleaved ABBA for the r13 robust-stats rework: OLD aggregate+broadcast-rejoin shapes of events_winsorized_stats / events_mad_outliers (inlined verbatim) vs the shipped window-aggregate shapes. Usage: python tools/bench_robust_ab.py <sf_dir>."
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import Window, functions as F
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab

def _readings(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("station"), "ts", "event_id", "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"))

def old_winsor(spark, sf_dir):
    ev = _readings(spark, sf_dir)
    w_rank = Window.partitionBy("station").orderBy("v_cents", "event_id")
    w_all = Window.partitionBy("station")
    r = ev.select("station", "v_cents",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"))
    lo = F.greatest(F.lit(1), F.expr("(n * 5 + 99) div 100"))
    hi = F.expr("(n * 95 + 99) div 100")
    cuts = r.groupBy("station").agg(
        F.min(F.when(F.col("rn") == lo, F.col("v_cents"))).alias("p05"),
        F.min(F.when(F.col("rn") == hi, F.col("v_cents"))).alias("p95"))
    clamped = F.least(F.greatest(F.col("v_cents"), F.col("p05")), F.col("p95"))
    return (r.join(F.broadcast(cuts), "station").groupBy("station").agg(
        F.min("n").cast("long").alias("n"),
        F.min("p05").cast("long").alias("p05_cents"),
        F.min("p95").cast("long").alias("p95_cents"),
        F.sum(clamped).cast("long").alias("winsorized_sum_cents"),
        F.expr("cast(sum(least(greatest(v_cents, p05), p95)) div min(n) as bigint)").alias("winsorized_mean_cents"),
        F.sum(F.when(F.col("v_cents") < F.col("p05"), 1).otherwise(0)).cast("long").alias("n_clamped_low"),
        F.sum(F.when(F.col("v_cents") > F.col("p95"), 1).otherwise(0)).cast("long").alias("n_clamped_high")))

def old_mad(spark, sf_dir):
    ev = _readings(spark, sf_dir)
    w_rank = Window.partitionBy("station").orderBy("v_cents", "event_id")
    w_all = Window.partitionBy("station")
    r = ev.select("station", "ts", "event_id", "v_cents",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"))
    med = r.groupBy("station").agg(
        F.min(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("v_cents"))).alias("med"))
    w_drank = Window.partitionBy("station").orderBy(F.abs(F.col("v_cents") - F.col("med")), "event_id")
    d = (r.join(F.broadcast(med), "station").select(
        "station", "ts", "event_id", "v_cents", "med",
        F.abs(F.col("v_cents") - F.col("med")).alias("dev"),
        F.row_number().over(w_drank).alias("drn"), F.col("n")))
    mad = d.groupBy("station").agg(
        F.min(F.when(F.col("drn") == F.expr("(n + 1) div 2"), F.col("dev"))).alias("mad"))
    return (d.join(F.broadcast(mad), "station")
        .filter((F.col("mad") > 0) & (6745 * F.col("dev") > 35000 * F.col("mad")))
        .select("station", "ts", "event_id", "v_cents",
            F.col("med").cast("long").alias("med_cents"),
            F.col("mad").cast("long").alias("mad_cents"),
            F.col("dev").cast("long").alias("dev_cents")))

def main():
    sf_dir = sys.argv[1]
    spark = get_spark("robust-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for name, oldf in (("events_winsorized_stats", old_winsor), ("events_mad_outliers", old_mad)):
        old_df = oldf(spark, sf_dir)
        new_df = QUERIES[name](spark, sf_dir)
        a = old_df.exceptAll(new_df).count(); b = new_df.exceptAll(old_df).count()
        print(name, "exceptAll", a, b); assert a == 0 and b == 0
        run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())
        interleaved_ab(f"{name} old", run(old_df), f"{name} new", run(new_df))

main()
