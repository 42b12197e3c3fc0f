import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table

SF = "/root/testdata/sf0.1"
spark = get_spark("bench-profile")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions","8")
spark.conf.set("spark.sql.adaptive.enabled","false")

HEAD = ["production_shift_rollup","dedup_combine_parts","q3_shipping_priority","docs_minhash_lsh_pairs","embeddings_knn_bruteforce","top1_active_record","q1_pricing_summary"]
for n in HEAD:
    QUERIES[n](spark, SF).count()
for n in HEAD:
    t0=time.perf_counter(); df=QUERIES[n](spark, SF); t1=time.perf_counter()
    df.count(); t2=time.perf_counter()
    print(f"{n:28s} construct {t1-t0:6.3f}  execute {t2-t1:6.3f}")
# raw scan costs
for t in ("lineitem","events","orders","documents","embeddings"):
    df = load_table(spark, SF, t); df.count()
    t0=time.perf_counter(); df2=load_table(spark, SF, t); c=df2.count(); t1=time.perf_counter()
    # full-column force: sum of hashes touches all columns
    import pyspark.sql.functions as F
    t2=time.perf_counter(); load_table(spark,SF,t).select(F.bit_xor(F.xxhash64(*df.columns))).collect(); t3=time.perf_counter()
    print(f"scan {t:10s} rows={c:8d} count={t1-t0:6.3f} full={t3-t2:6.3f}")
