import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.sources import load_table
from iotdatapipeline_spark.functions import expand_alternatives
import pyspark.sql.functions as F

SF="/root/testdata/sf0.1"
spark=get_spark("prof"); spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions","8"); spark.conf.set("spark.sql.adaptive.enabled","false")

def timed(label, df):
    df.count()
    t0=time.perf_counter(); n=df.count(); t=time.perf_counter()-t0
    print(f"{label:40s} {t:6.3f}  rows={n}")
    return df

ev = load_table(spark, SF, "events")
r = ev.select(F.col("user_id").alias("station"), F.col("event_type").alias("part"),
              F.col("event_id"), F.col("value"),
              F.floor(F.col("value")*100).cast("long").alias("counter"))
timed("readings select", r)
r2 = r.withColumn("cadena", F.when(F.col("station")%5==0, F.col("part")).otherwise(
        F.concat(F.col("part"), F.lit("/"), (F.col("station")%3).cast("string"))))
timed("plus cadena", r2)
r3 = r2.withColumn("part_alts", expand_alternatives(F.col("cadena")))
timed("plus expand_alternatives", r3)
r4 = r3.select("*", F.explode("part_alts").alias("part2"))
timed("exploded", r4)
agg = r4.groupBy("station","part2").agg(F.sum("counter").alias("ct"), F.count(F.lit(1)).alias("n"),
        F.min_by("cadena","event_id").alias("orig"), F.max_by("value","event_id").alias("cyc"))
timed("groupBy agg", agg)
# events ts conversion cost check
timed("events raw count", ev)
ev2 = spark.read.parquet(SF+"/events.parquet")
timed("events no-convert count", ev2)
# rollup pieces
from iotdatapipeline_spark.operators.counter_rollup import counter_deltas, with_shift
rr = ev.select(F.col("user_id").alias("station"), F.col("event_type").alias("part"), F.col("ts"),
               F.col("event_id"), F.floor(F.col("value")*100).cast("long").alias("counter"))
d = counter_deltas(rr, order_cols=("event_id",))
timed("counter_deltas window", d)
d2 = with_shift(d)
agg2 = d2.filter(F.col("emits")).groupBy("station","part","plan_date","shift_id").agg(F.sum("delta").alias("q"))
timed("rollup full agg", agg2)
