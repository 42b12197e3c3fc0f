"""x10 scale row for cdf_ivm_minmax_foreach_batch (r12 — IVM tier 2).

Source = 1M-row x10 events projection keyed by event_id; view =
per-group (cnt, min_x, max_x) over 1,000 groups (g = event_id % 1000).
Each batch is fed LIVE from ``changes()`` (the r12 commit-time CDF —
no materialization step), alternating UPDATE bands (preimages leave:
repair only where the old value held the extreme) and DELETE bands
(extreme-holding rows leave: the repair-heavy case). The claim: per
batch O(batch) + O(affected groups) + O(source rows of REPAIRED
groups) — the repair read is key-pruned by the view's group keys and
never O(source). The final view is asserted equal to the direct
aggregate.

Usage: python tools/bench_ivm_minmax.py [--tiles 10]
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
from iotdatapipeline_spark.streaming.sinks import cdf_ivm_minmax_foreach_batch

ap = argparse.ArgumentParser()
ap.add_argument("--tiles", type=int, default=10)
args = ap.parse_args()

xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=args.tiles)
spark = get_spark("bench-ivm-minmax")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "32")

stem = tempfile.mkdtemp(prefix="ivmmm_scale_")
ev = load_table(spark, xdir, "events").select(
    F.col("event_id").alias("k"),
    (F.col("event_id") % 1000).alias("g"),
    F.floor(F.col("value") * 100).cast("long").alias("x"),
)
n = ev.count()
src_root = os.path.join(stem, "src")
src = VersionedTable(spark, src_root)
src.create(ev, n_files=32, cluster_by=["k"])

ivm = cdf_ivm_minmax_foreach_batch(
    os.path.join(stem, "view"), src_root, ["g"], min_cols=["x"], max_cols=["x"]
)
seed = src.snapshot().select("g", "x").withColumns(
    {"_change_type": F.lit("insert"), "_commit_version": F.lit(1).cast("long")}
)
t0 = time.perf_counter()
ivm(seed, 0)
out = {
    "tiles": args.tiles,
    "source_rows": n,
    "groups": 1000,
    "seed_s": round(time.perf_counter() - t0, 3),
    "batches": [],
}

lo = 0
plan = [("update", 1_000), ("delete", 8_000), ("update", 64_000), ("delete", 256_000)]
for i, (kind, band) in enumerate(plan, start=1):
    sel = src.snapshot().filter((F.col("k") >= lo) & (F.col("k") < lo + band))
    lo += band
    v0 = src.version()
    if kind == "update":
        # lower the value: preimages leave; repair fires only for
        # groups whose stored MIN was the departing value
        src.merge_into(sel.withColumn("x", F.col("x") - 1), ["k"])
    else:
        src.merge_into(sel, ["k"], when_matched="delete")
    ch = src.changes(v0, src.version(), keys=["k"], include_preimages=True).select(
        "g", "x", "_change_type"
    ).withColumn("_commit_version", F.lit(src.version()).cast("long"))
    t0 = time.perf_counter()
    ch = ch.localCheckpoint(eager=True)  # the one per-batch spill
    nch = ch.count()
    ivm(ch, i)
    out["batches"].append(
        {"kind": kind, "change_rows": nch, "apply_s": round(time.perf_counter() - t0, 3)}
    )

view = VersionedTable(spark, os.path.join(stem, "view"))
direct = src.snapshot().groupBy("g").agg(
    F.count(F.lit(1)).cast("long").alias("cnt"),
    F.min("x").alias("min_x"),
    F.max("x").alias("max_x"),
)
v = view.snapshot().select("g", "cnt", "min_x", "max_x")
out["view_equals_direct"] = (
    v.exceptAll(direct).isEmpty() and direct.exceptAll(v).isEmpty()
)
print(json.dumps(out))
