"""Identity-assignment cost at x10 (r11 due diligence).

The fresh-id path is a row_number over a SINGLE partition of the
write batch (deterministic key-ordered ranks) — O(batch log batch) on
one core by construction. This measures whether that window is a real
cost at a serious batch size: an 800k-row identity table takes a
200k-row fresh insert with ids assigned, vs the identical merge into
a twin table with NO identity (source carries the ids). The delta is
the whole identity tax (lookup join + split + count + window).

Usage: python tools/bench_identity_assign.py [--tiles 10]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import ensure_crossover_dir
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.sources import load_table
from iotdatapipeline_spark.sources.versioned import VersionedTable

ap = argparse.ArgumentParser()
ap.add_argument("--tiles", type=int, default=10)
args = ap.parse_args()

xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=args.tiles)
spark = get_spark("bench-identity")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "32")

ev = load_table(spark, xdir, "events").select(
    F.col("event_id").alias("k"),
    F.col("user_id").alias("station"),
    F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
)
n = ev.count()
cut = int(n * 0.8)
base = ev.filter(F.col("k") < cut).withColumn("rid", F.col("k") + 1)
fresh = ev.filter(F.col("k") >= cut)
out = {"tiles": args.tiles, "base_rows": cut, "insert_rows": n - cut, "cases": {}}

stem = tempfile.mkdtemp(prefix="idbench_")
for label, with_identity in (("identity_assigned", True), ("ids_supplied", False)):
    t = VersionedTable(spark, os.path.join(stem, label))
    t.create(base, n_files=32, cluster_by=["k"])
    if with_identity:
        t0 = time.perf_counter()
        t.set_identity("rid")
        out["cases"][label] = {"declare_s": round(time.perf_counter() - t0, 3)}
        src = fresh
    else:
        out["cases"][label] = {}
        src = fresh.withColumn("rid", F.col("k") + 1)
    t0 = time.perf_counter()
    t.merge_into(src, ["k"])
    out["cases"][label]["merge_s"] = round(time.perf_counter() - t0, 3)
    got = t.snapshot().agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("rid").alias("d")
    ).collect()[0]
    out["cases"][label]["unique_ids"] = bool(got["n"] == got["d"] == n)

print(json.dumps(out))
