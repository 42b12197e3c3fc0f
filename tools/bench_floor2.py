import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
spark=get_spark("floor2"); spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions","8"); spark.conf.set("spark.sql.adaptive.enabled","false")
def noop(df): df.write.format("noop").mode("overwrite").save()
def t(label, fn, reps=5):
    fn(); t0=time.perf_counter()
    for _ in range(reps): fn()
    print(label, round((time.perf_counter()-t0)/reps,4), flush=True)
t("noop 1-part range", lambda: noop(spark.range(1000,numPartitions=1)))
t("count 1-part range", lambda: spark.range(1000,numPartitions=1).count())
SF="/root/testdata/sf0.1"
for name in ("q1_pricing_summary","docs_token_stats","top1_active_record","production_shift_rollup"):
    df = QUERIES[name](spark, SF)
    t(f"noop  {name}", lambda d=df: noop(d))
    t(f"count {name}", lambda d=df: d.count())
