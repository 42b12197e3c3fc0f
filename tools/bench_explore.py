"""Throwaway config A/B harness for the sf0.1 bench gate."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES

SF = "/root/testdata/sf0.1"
HEADLINE = ["production_shift_rollup","q1_pricing_summary","q3_shipping_priority",
            "dedup_combine_parts","top1_active_record","events_sessionization",
            "docs_minhash_lsh_pairs","docs_exact_dedup","embeddings_knn_bruteforce","docs_token_stats"]

spark = get_spark("bench-explore")
spark.sparkContext.setLogLevel("ERROR")

CONFIGS = {
    "base32_aqe": {"spark.sql.shuffle.partitions":"32","spark.sql.adaptive.enabled":"true"},
    "p8_aqe": {"spark.sql.shuffle.partitions":"8","spark.sql.adaptive.enabled":"true"},
    "p8_noaqe": {"spark.sql.shuffle.partitions":"8","spark.sql.adaptive.enabled":"false"},
    "p32_noaqe": {"spark.sql.shuffle.partitions":"32","spark.sql.adaptive.enabled":"false"},
    "p8_noaqe_16m": {"spark.sql.shuffle.partitions":"8","spark.sql.adaptive.enabled":"false","spark.sql.files.maxPartitionBytes":"16m"},
    "p16_noaqe_32m": {"spark.sql.shuffle.partitions":"16","spark.sql.adaptive.enabled":"false","spark.sql.files.maxPartitionBytes":"32m"},
}

# global warmup
for n in HEADLINE:
    QUERIES[n](spark, "/root/testdata/sf0.001").count()

results = {}
for cname, conf in CONFIGS.items():
    for k,v in conf.items(): spark.conf.set(k,v)
    t = {}
    for n in HEADLINE:
        QUERIES[n](spark, SF).count()  # warm this config's plan
        t0 = time.perf_counter(); QUERIES[n](spark, SF).count(); t[n] = round(time.perf_counter()-t0,3)
    # reset
    spark.conf.set("spark.sql.files.maxPartitionBytes","128m")
    results[cname] = {"total": round(sum(t.values()),3), **t}
    print(cname, json.dumps(results[cname]), flush=True)
