import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from iotdatapipeline_spark import get_spark
spark=get_spark("floor"); spark.sparkContext.setLogLevel("ERROR")
def t(label, fn, reps=5):
    fn()
    t0=time.perf_counter()
    for _ in range(reps): fn()
    print(label, round((time.perf_counter()-t0)/reps,4), flush=True)
t("range-count 1 part no shuffle", lambda: spark.range(1000,numPartitions=1).count())
t("range-count 32 parts", lambda: spark.range(1000,numPartitions=32).count())
spark.conf.set("spark.locality.wait","0")
t("locality0 1 part", lambda: spark.range(1000,numPartitions=1).count())
spark.conf.set("spark.sql.shuffle.partitions","8")
t("shuffle job p8", lambda: spark.range(1000,numPartitions=4).groupBy((spark.range(1).id%2).alias("k")).count().count())
