"""Per-query Spark-vs-DuckDB ratios under the round-8 noop protocol.

Spark side: noop write (computes every output column, discards rows).
DuckDB side: fetchall (its full-compute analog). Median of N, warmed.
Usage: python tools/bench_noop_detail.py [sf_dir] [query ...]
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import ORACLE as ORACLES, QUERIES

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
NAMES = sys.argv[2:] or [
    "production_shift_rollup", "q1_pricing_summary", "q3_shipping_priority",
    "dedup_combine_parts", "top1_active_record", "events_sessionization",
    "docs_minhash_lsh_pairs", "docs_exact_dedup", "embeddings_pq_topk",
    "docs_token_stats",
]
REPS = int(os.environ.get("REPS", "3"))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _src(t):
    p = os.path.join(SF, f"{t}.parquet")
    return f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else f"read_parquet('{p}')"


def med(fn):
    s = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        s.append(time.perf_counter() - t0)
    return round(statistics.median(s), 3)


spark = get_spark("bench-noop-detail")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "8")
spark.conf.set("spark.sql.adaptive.enabled", "false")

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM {_src(t)}")

out = {}
for n in NAMES:
    df = QUERIES[n](spark, SF)
    noop = lambda: df.write.format("noop").mode("overwrite").save()
    noop()  # warm
    s = med(noop)
    d = None
    if n in ORACLES:
        sql = ORACLES[n]
        con.sql(sql).fetchall()  # warm
        d = med(lambda: con.sql(sql).fetchall())
    out[n] = {"spark": s, "duckdb": d, "ratio": round(s / d, 2) if d else None}
    print(n, json.dumps(out[n]), flush=True)

tot_s = sum(v["spark"] for v in out.values())
tot_d = sum(v["duckdb"] for v in out.values() if v["duckdb"])
print(json.dumps({"total_spark": round(tot_s, 3), "total_duckdb": round(tot_d, 3),
                  "ratio": round(tot_s / tot_d, 2)}))
