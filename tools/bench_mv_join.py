"""Pin JoinMaterializedView (row-level IVM join view) at x160 (r13).

Protocol: fact = the x160 events projection (event_id, station,
v_cents; station-clustered), dim = one row per station (grp payload).
The view materializes the FULL fact⋈dim (|view| == |fact|), then
per band of fact updates (contiguous station ranges, 10k → 100k →
1M changed rows) plus one dim payload refresh, the view is brought
current two ways in one interleaved session: (a) ``refresh()`` — one
differential step (ΔA⋈B_old / A_old⋈ΔB, stats-pruned old sides),
(b) the recompute arm — full join rewritten into a twin. The claim:
refresh cost and FILES REWRITTEN track the band (the files holding
affected (event_id, station) pairs), never the view size; recompute
pays O(|fact⋈dim|) every run. The view is asserted equal to the
direct join at the end.

Usage: python tools/bench_mv_join.py [--tiles 160]
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
from iotdatapipeline_spark.matview import JoinMaterializedView
from iotdatapipeline_spark.sources import load_table
from iotdatapipeline_spark.sources.versioned import VersionedTable

ap = argparse.ArgumentParser()
ap.add_argument("--tiles", type=int, default=160)
args = ap.parse_args()

xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=args.tiles)
spark = get_spark("bench-mv-join")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.adaptive.enabled", "true")

stem = tempfile.mkdtemp(prefix="mvjoin_scale_")
ev = load_table(spark, xdir, "events").select(
    "event_id",
    F.col("user_id").alias("station"),
    F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
)
n = ev.count()
fact = VersionedTable(spark, os.path.join(stem, "fact"))
fact.create(ev, n_files=64, cluster_by=["station"])
dim_df = ev.select("station").distinct().withColumn(
    "grp", F.col("station") % 256
)
dim = VersionedTable(spark, os.path.join(stem, "dim"))
dim.create(dim_df, n_files=4, cluster_by=["station"])

t0 = time.perf_counter()
mv = JoinMaterializedView.create(
    spark, os.path.join(stem, "view"),
    os.path.join(stem, "fact"), os.path.join(stem, "dim"),
    join_keys=["station"], a_key="event_id", b_key="station",
)
seed_s = round(time.perf_counter() - t0, 3)
vt = mv.table()

out = {
    "tiles": args.tiles,
    "fact_rows": n,
    "stations": dim_df.count(),
    "seed_s": seed_s,
    "view_files": len(vt._read_manifest(vt.version())["files"]),
    "bands": [],
}

def band_step(tag, mutate, recompute_arm: bool):
    mutate()
    before_m = vt._read_manifest(vt.version())
    t0 = time.perf_counter()
    mv.refresh()
    inc_s = round(time.perf_counter() - t0, 3)
    after_m = vt._read_manifest(vt.version())
    rewritten = len(set(after_m["files"]) - set(before_m["files"]))
    row = {"band": tag, "refresh_s": inc_s, "files_rewritten": rewritten,
           "view_files": len(after_m["files"])}
    if recompute_arm:
        t0 = time.perf_counter()
        full = fact.snapshot().join(dim.snapshot(), "station").select(
            "event_id", "station", "v_cents", "grp"
        )
        tw = os.path.join(stem, f"recompute_{tag}")
        VersionedTable(spark, tw).create(
            full, n_files=64, cluster_by=["event_id", "station"]
        )
        row["recompute_s"] = round(time.perf_counter() - t0, 3)
    out["bands"].append(row)

sN = out["stations"]
for lo, width in ((0, sN // 2400), (sN // 80, sN // 240), (sN // 8, sN // 24)):
    def fact_band(lo=lo, width=width):
        upd = (
            fact.snapshot()
            .filter((F.col("station") >= lo) & (F.col("station") < lo + width))
            .withColumn("v_cents", F.col("v_cents") + 1)
        )
        fact.merge_into(upd, ["event_id"])
    # recompute arm only on the LAST (largest) band: one honest
    # O(view) datapoint without tripling the session
    band_step(f"fact_stations_{width}", fact_band, width == sN // 24)

def dim_band():
    upd = (
        dim.snapshot()
        .filter(F.col("station") < sN // 480)
        .withColumn("grp", F.col("grp") + 256)
    )
    dim.merge_into(upd, ["station"])
band_step(f"dim_refresh_{sN // 480}", dim_band, False)

want = fact.snapshot().join(dim.snapshot(), "station").select(
    "event_id", "station", "v_cents", "grp"
)
got = mv.snapshot().select("event_id", "station", "v_cents", "grp")
out["view_exact"] = bool(
    got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
)
print(json.dumps(out))
