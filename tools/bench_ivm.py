"""x10 scale row for cdf_ivm_foreach_batch (r11 feature).

Source = 1M-row x10 events projection; view = per-bucket (cnt, sum)
over 1,000 groups. Batches of growing changed-row counts are applied
as signed deltas (materialized first — the producer's derivation cost
is excluded, as in bench_cdc_apply). The claim under test: per-batch
cost is O(batch) + a key-pruned merge of AFFECTED GROUPS — flat-ish
in batch size while the batch is small, never O(source) or O(view).
The final view is asserted equal to the direct aggregate.

Usage: python tools/bench_ivm.py [--tiles 10]
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
from iotdatapipeline_spark.streaming.sinks import cdf_ivm_foreach_batch

ap = argparse.ArgumentParser()
ap.add_argument("--tiles", type=int, default=10)
args = ap.parse_args()

xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=args.tiles)
spark = get_spark("bench-ivm")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "32")

stem = tempfile.mkdtemp(prefix="ivm_scale_")
ev = load_table(spark, xdir, "events").select(
    F.col("event_id").alias("k"),
    (F.col("event_id") % 1000).alias("g"),
    F.floor(F.col("value") * 100).cast("long").alias("x"),
)
n = ev.count()
src = VersionedTable(spark, os.path.join(stem, "src"))
src.create(ev, n_files=32, cluster_by=["k"])

ivm = cdf_ivm_foreach_batch(os.path.join(stem, "view"), ["g"], ["x"])
seed = src.snapshot().select("g", "x").withColumn("_change_type", F.lit("insert"))
t0 = time.perf_counter()
ivm(seed, 0)
out = {"tiles": args.tiles, "source_rows": n, "groups": 1000,
       "seed_s": round(time.perf_counter() - t0, 3), "batches": []}

lo = 0
for i, band in enumerate((1_000, 8_000, 64_000, 256_000), start=1):
    upd = (
        src.snapshot()
        .filter((F.col("k") >= lo) & (F.col("k") < lo + band))
        .withColumn("x", F.col("x") + 1)
    )
    lo += band
    v0 = src.version()
    src.merge_into(upd, ["k"])
    ch = src.changes(v0, src.version(), keys=["k"], include_preimages=True).select(
        "g", "x", "_change_type"
    )
    p = os.path.join(stem, f"b{i}")
    ch.write.parquet(p)
    ch = spark.read.parquet(p)
    nch = ch.count()
    t0 = time.perf_counter()
    ivm(ch, i)
    out["batches"].append({"change_rows": nch, "apply_s": round(time.perf_counter() - t0, 3)})

view = VersionedTable(spark, os.path.join(stem, "view"))
direct = src.snapshot().groupBy("g").agg(
    F.count(F.lit(1)).cast("long").alias("cnt"), F.sum("x").cast("long").alias("sum_x")
)
diff = view.snapshot().select("g", "cnt", "sum_x").exceptAll(direct).count()
out["view_equals_direct"] = diff == 0 and direct.exceptAll(
    view.snapshot().select("g", "cnt", "sum_x")
).count() == 0
print(json.dumps(out))
