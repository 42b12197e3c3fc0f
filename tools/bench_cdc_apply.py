"""Pin cdf_apply_foreach_batch's O(changed rows) claim at x10 scale
(r11 verdict #7).

Protocol: source VersionedTable = the x10 events projection keyed and
clustered by event_id (~6M rows, 32 files). The mirror is seeded from
batch 0 (the initial snapshot as inserts), then N change batches of
GROWING changed-row counts (contiguous event_id bands, so the COW
merge's stats pruning can localize the rewrite) are produced with
source merges and applied from ``changes()``. Per batch we record
apply seconds, changed rows, and how many mirror files the merge
rewrote. O(changed rows) shows as apply time tracking the band size
(and the rewritten-file count), NOT the mirror size, which stays
constant throughout. Convergence is asserted at the end (mirror ==
source snapshot).

Usage: python tools/bench_cdc_apply.py [--tiles 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import ensure_crossover_dir
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.sources import load_table
from iotdatapipeline_spark.sources.versioned import VersionedTable
from iotdatapipeline_spark.streaming.sinks import cdf_apply_foreach_batch

ap = argparse.ArgumentParser()
ap.add_argument("--tiles", type=int, default=10)
ap.add_argument(
    "--no-materialize",
    action="store_true",
    help="feed the applier straight from changes() (the commit-time "
    "CDF fast path) instead of pre-writing each batch — measures the "
    "END-TO-END pipeline (feed read + apply), the r12 claim",
)
ap.add_argument(
    "--force-derive",
    action="store_true",
    help="with --no-materialize: disable the commit-time fast path so "
    "changes() pays the snapshot-diff derivation — the pre-r12 "
    "pipeline, for same-session ABBA comparison",
)
ap.add_argument(
    "--mirror-cdf",
    choices=("on", "off"),
    default="on",
    help="whether the MIRROR table writes its own change feed (off = "
    "the clean apply floor for a mirror nobody tails; on = the r12 "
    "default, mirror merges pay their O(changed rows) feed write)",
)
args = ap.parse_args()

xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=args.tiles)
spark = get_spark("bench-cdc-apply")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "true")

import tempfile

stem = tempfile.mkdtemp(prefix="cdc_scale_")
ev = load_table(spark, xdir, "events").select(
    "event_id",
    F.col("user_id").alias("station"),
    F.col("event_type").alias("part"),
    F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
)
n_rows = ev.count()
src = VersionedTable(spark, os.path.join(stem, "src"))
src.create(ev, n_files=32, cluster_by=["event_id"])
if args.force_derive:
    import types

    src._changes_from_commits = types.MethodType(lambda self, *a, **k: None, src)

apply_fn = cdf_apply_foreach_batch(os.path.join(stem, "mirror"), ["event_id"])

# batch 0: seed the mirror with the full snapshot as inserts
seed = src.snapshot().withColumns(
    {
        "_change_type": F.lit("insert"),
        "_commit_version": F.lit(1).cast("long"),
    }
)
t0 = time.perf_counter()
apply_fn(seed, 0)
seed_s = round(time.perf_counter() - t0, 3)

mirror = VersionedTable(spark, os.path.join(stem, "mirror"))
if args.mirror_cdf == "off":
    mirror.set_cdf(False)
out = {
    "tiles": args.tiles,
    "source_rows": n_rows,
    "feed": (
        ("live-derived" if args.force_derive else "live-changes")
        if args.no_materialize
        else "materialized"
    ),
    "mirror_cdf": args.mirror_cdf,
    "seed_s": seed_s,
    "batches": [],
}
lo = 0
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
    if not args.no_materialize:
        # MATERIALIZE the batch: the apply's own cost is what the claim
        # is about — deriving the feed is the producer's cost. With
        # --no-materialize the applier reads changes() directly, which
        # since r12 serves from COMMIT-TIME change files (O(changed
        # rows)), so end-to-end ≈ the apply floor — the r11 runs where
        # this arm paid 7–8.7 s/batch were pricing the snapshot-diff
        # derivation this replaced.
        batch_path = os.path.join(stem, f"batch{i}")
        ch.write.parquet(batch_path)
        ch = spark.read.parquet(batch_path)
    nch = ch.filter(F.col("_change_type") == "update_postimage").count()
    m_v0 = mirror.version()
    t0 = time.perf_counter()
    if args.no_materialize:
        # one feed evaluation inside the timed region (what a streaming
        # consumer pays per micro-batch: the source spills each batch
        # once); without this the applier's several jobs would each
        # re-run the netting and overstate the feed cost
        ch = ch.localCheckpoint(eager=True)
    apply_fn(ch, i)
    dt = round(time.perf_counter() - t0, 3)
    mt = mirror._read_manifest(mirror.version()).get("metrics") or {}
    out["batches"].append(
        {
            "changed_rows": nch,
            "apply_s": dt,
            "mirror_files_rewritten": mt.get("files_removed"),
            "mirror_files_total": len(mirror._read_manifest(m_v0)["files"]),
        }
    )

same = (
    mirror.snapshot().exceptAll(src.snapshot()).isEmpty()
    and src.snapshot().exceptAll(mirror.snapshot()).isEmpty()
)
out["converged"] = bool(same)
print(json.dumps(out))
