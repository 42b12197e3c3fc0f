"""x10 scale row for WHEN NOT MATCHED BY SOURCE (r11 feature).

Target = the x10 events projection (1M rows) clustered by event_id in
32 files. Two sync merges from the same 10k-row source band:
  (a) condition-scoped (a contiguous event_id band near the source) —
      the condition's range bounds must keep out-of-scope files
      untouched;
  (b) unconditioned full sync — every file is in scope by semantics
      (any file may hold a now-absent key), the documented caveat.
Reports seconds + files rewritten for both, so the O(scope) vs
O(table) trade is a recorded number, not a docstring claim.

Usage: python tools/bench_sync_merge.py [--tiles 10]
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
spark = get_spark("bench-sync-merge")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "true")

ev = load_table(spark, xdir, "events").select(
    "event_id",
    F.col("user_id").alias("station"),
    F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
)
n_rows = ev.count()
out = {"tiles": args.tiles, "rows": n_rows, "cases": {}}

for label, cond in (
    ("scoped", "event_id >= 100000 AND event_id < 140000"),
    ("full_sync", None),
):
    stem = tempfile.mkdtemp(prefix=f"sync_{label}_")
    t = VersionedTable(spark, os.path.join(stem, "t"))
    t.create(ev, n_files=32, cluster_by=["event_id"])
    n_files = len(t._read_manifest(1)["files"])
    # source: rows 100k-130k updated (+1 cent); rows 130k-140k of the
    # target are absent from the source -> delete-eligible
    src = (
        t.snapshot()
        .filter((F.col("event_id") >= 100_000) & (F.col("event_id") < 130_000))
        .withColumn("v_cents", F.col("v_cents") + 1)
    )
    t0 = time.perf_counter()
    v = t.merge_into(
        src,
        ["event_id"],
        not_matched_by_source="delete",
        not_matched_by_source_condition=cond,
    )
    dt = round(time.perf_counter() - t0, 3)
    mt = t._read_manifest(v).get("metrics") or {}
    expect = n_rows - 10_000 if cond else 30_000
    got = t.snapshot().count()
    out["cases"][label] = {
        "merge_s": dt,
        "files_before": n_files,
        "files_rewritten": mt.get("files_removed"),
        "rows_after": got,
        "rows_expected": expect,
        "correct": got == expect,
    }

print(json.dumps(out))
