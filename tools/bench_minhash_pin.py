"""Pin docs_minhash_lsh_pairs' r10 driver-bench swing (r11 verdict #1).

The r10 driver row doubled (0.306 -> 0.633 s at sf0.1) with the plan
untouched since r9; this is the same standalone protocol that settled
top1_active_record in r10:

  1. noop median-of-7 of the full query (Spark) vs fetchall (DuckDB)
  2. an ABBA pair (Spark, DuckDB, DuckDB, Spark medians-of-3) so an
     order/session drift shows up as A1 != A2
  3. stage decomposition: shingle-explode+base-hash projection,
     signature aggregate, full band/bucket/pair pipeline — if one
     stage regressed, its share moved

Usage: python tools/bench_minhash_pin.py [sf_dir]
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.analytics.dedup import (
    MINHASH_P,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_set,
)
from iotdatapipeline_spark.plans import ORACLE, QUERIES
from iotdatapipeline_spark.sources import load_table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NAME = "docs_minhash_lsh_pairs"


def med(fn, reps):
    s = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        s.append(time.perf_counter() - t0)
    return round(statistics.median(s), 3)


spark = get_spark("bench-minhash-pin")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "8")
spark.conf.set("spark.sql.adaptive.enabled", "false")

con = duckdb.connect()
p = os.path.join(SF, "documents.parquet")
src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"read_parquet('{p}')"
con.sql(f"CREATE VIEW documents AS SELECT * FROM {src}")

df = QUERIES[NAME](spark, SF)
noop = lambda: df.write.format("noop").mode("overwrite").save()
duck = lambda: con.sql(ORACLE[NAME]).fetchall()
noop()
duck()  # warm both

out = {"sf": SF}
# 1. medians-of-7
out["spark_med7"] = med(noop, 7)
out["duckdb_med7"] = med(duck, 7)
out["ratio_med7"] = round(out["spark_med7"] / out["duckdb_med7"], 2)

# 2. ABBA (medians-of-3 per arm)
a1 = med(noop, 3)
b1 = med(duck, 3)
b2 = med(duck, 3)
a2 = med(noop, 3)
out["abba"] = {"spark_1": a1, "duckdb_1": b1, "duckdb_2": b2, "spark_2": a2}

# 3. stage decomposition (Spark side, noop each prefix)
docs = load_table(spark, SF, "documents")
sh = shingle_set(docs, "doc_id", "text", n=3, distinct=False)
x = (
    F.conv(F.substring(F.md5(F.col("shingle").cast("binary")), 1, 8), 16, 10).cast("long")
    % MINHASH_P
)
pre = sh.select(F.col("doc_id"), x.alias("__x"))
sigs = minhash_signatures(sh, "doc_id", k=8)
pairs = lsh_candidate_pairs(sigs, "doc_id", k=8, rows_per_band=2)
stages = {}
for label, sdf in (("shingle_hash", pre), ("signatures", sigs), ("full_pairs", pairs)):
    run = lambda d=sdf: d.write.format("noop").mode("overwrite").save()
    run()
    stages[label] = med(run, 5)
out["stages_med5"] = stages

print(json.dumps(out))
