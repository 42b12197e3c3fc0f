"""Pin cdf_scd2_foreach_batch's O(batch) claim at x10 scale (r12).

Protocol: source VersionedTable = the x10 events projection keyed and
clustered by event_id (~6M rows, 32 files). The SCD2 history is seeded
from batch 0 (the initial snapshot as inserts), then N change batches
of GROWING changed-row counts (contiguous event_id bands) are produced
with source merges and applied LIVE from ``changes()`` (the commit-time
feed). The claim: per-batch cost tracks the band size and the files
holding affected keys' CURRENT records — never the accumulated history
size, which grows monotonically (each batch ADDS closed records that
are never revisited). At the end the current slice must equal the
source snapshot, and the history row count must equal
seed + total changed rows (each change OPENS one new record; the
close rewrites the predecessor in place rather than adding a row).

Usage: python tools/bench_scd2.py [--tiles 10]
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
from iotdatapipeline_spark.streaming.sinks import cdf_scd2_foreach_batch

ap = argparse.ArgumentParser()
ap.add_argument("--tiles", type=int, default=10)
args = ap.parse_args()

xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=args.tiles)
spark = get_spark("bench-scd2")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "true")

stem = tempfile.mkdtemp(prefix="scd2_scale_")
ev = load_table(spark, xdir, "events").select(
    "event_id",
    F.col("user_id").alias("station"),
    F.col("event_type").alias("part"),
    F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
)
n_rows = ev.count()
src = VersionedTable(spark, os.path.join(stem, "src"))
src.create(ev, n_files=32, cluster_by=["event_id"])

apply_fn = cdf_scd2_foreach_batch(os.path.join(stem, "hist"), ["event_id"])

seed = src.snapshot().withColumns(
    {
        "_change_type": F.lit("insert"),
        "_commit_version": F.lit(1).cast("long"),
    }
)
t0 = time.perf_counter()
apply_fn(seed, 0)
seed_s = round(time.perf_counter() - t0, 3)

hist = VersionedTable(spark, os.path.join(stem, "hist"))
out = {
    "tiles": args.tiles,
    "source_rows": n_rows,
    "seed_s": seed_s,
    "batches": [],
}
lo = 0
total_changed = 0
for i, band in enumerate((1_000, 4_000, 16_000, 64_000, 256_000), start=1):
    upd = (
        src.snapshot()
        .filter((F.col("event_id") >= lo) & (F.col("event_id") < lo + band))
        .withColumn("v_cents", F.col("v_cents") + 1)
    )
    lo += band
    v0 = src.version()
    src.merge_into(upd, ["event_id"])
    ch = src.changes(v0, src.version(), keys=["event_id"]).withColumn(
        "_commit_version", F.lit(src.version()).cast("long")
    )
    nch = ch.filter(F.col("_change_type") == "update_postimage").count()
    total_changed += nch
    h_rows_before = len(hist._read_manifest(hist.version())["files"])
    t0 = time.perf_counter()
    # one feed evaluation inside the timed region, same as the CDC bench
    ch = ch.localCheckpoint(eager=True)
    apply_fn(ch, i)
    dt = round(time.perf_counter() - t0, 3)
    mt = hist._read_manifest(hist.version()).get("metrics") or {}
    out["batches"].append(
        {
            "changed_rows": nch,
            "apply_s": dt,
            "history_files_rewritten": mt.get("files_removed"),
            "history_files_before": h_rows_before,
        }
    )

cur = hist.snapshot().filter("is_current").select(
    "event_id", "station", "part", "v_cents"
)
want = src.snapshot().select("event_id", "station", "part", "v_cents")
out["current_converged"] = bool(
    cur.exceptAll(want).isEmpty() and want.exceptAll(cur).isEmpty()
)
hist_n = hist.snapshot().count()
out["history_rows"] = hist_n
out["history_rows_expected"] = n_rows + total_changed  # closed stay; each change opens one
out["history_exact"] = bool(hist_n == n_rows + total_changed)
print(json.dumps(out))
