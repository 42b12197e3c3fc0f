"""Pin MaterializedView.refresh()'s cost against the job it replaces
(REFRESH MATERIALIZED VIEW as a full recompute) at x10 scale (r12).

Protocol: 1M-row event_id-clustered source; SUM/COUNT view grouped to
1,000 station-groups. After each update band the view is brought
current two ways, interleaved in one session: (a) `refresh()` — the
orchestrated incremental path (feed read + delta aggregate + key-
pruned merge), and (b) the recompute every non-incremental warehouse
runs (re-aggregate the full source + full overwrite into a twin
table). Incremental must track the band; recompute pays O(source)
every time. Both views are asserted equal to the direct aggregate at
the end.

Usage: python tools/bench_mv_refresh.py [--tiles 10]
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
from iotdatapipeline_spark.matview import MaterializedView
from iotdatapipeline_spark.sources import load_table
from iotdatapipeline_spark.sources.versioned import VersionedTable

ap = argparse.ArgumentParser()
ap.add_argument("--tiles", type=int, default=10)
args = ap.parse_args()

xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=args.tiles)
spark = get_spark("bench-mv-refresh")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "32")

stem = tempfile.mkdtemp(prefix="mv_scale_")
ev = load_table(spark, xdir, "events").select(
    "event_id",
    (F.col("user_id") % 1000).alias("g"),
    F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
)
n = ev.count()
src = VersionedTable(spark, os.path.join(stem, "src"))
src.create(ev, n_files=32, cluster_by=["event_id"])

t0 = time.perf_counter()
mv = MaterializedView.create(
    spark, os.path.join(stem, "mv"), os.path.join(stem, "src"),
    group_by=["g"], sum_cols=["v_cents"], keys=["event_id"],
)
seed_s = round(time.perf_counter() - t0, 3)

out = {"tiles": args.tiles, "source_rows": n, "seed_s": seed_s, "bands": []}
lo = 0
for band in (1_000, 16_000, 256_000):
    upd = (
        src.snapshot()
        .filter((F.col("event_id") >= lo) & (F.col("event_id") < lo + band))
        .withColumn("v_cents", F.col("v_cents") + 1)
    )
    lo += band
    src.merge_into(upd, ["event_id"])
    t0 = time.perf_counter()
    mv.refresh()
    inc_s = round(time.perf_counter() - t0, 3)
    # the recompute arm: full re-aggregate + full rewrite of a twin
    t0 = time.perf_counter()
    full = src.snapshot().groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("v_cents").cast("long").alias("sum_v_cents"),
    )
    tw_root = os.path.join(stem, f"recompute_{band}")
    VersionedTable(spark, tw_root).create(full, cluster_by=["g"])
    rec_s = round(time.perf_counter() - t0, 3)
    out["bands"].append(
        {"changed_rows": band, "refresh_s": inc_s, "recompute_s": rec_s}
    )

want = src.snapshot().groupBy("g").agg(
    F.count(F.lit(1)).cast("long").alias("cnt"),
    F.sum("v_cents").cast("long").alias("sum_v_cents"),
)
got = mv.snapshot().select("g", "cnt", "sum_v_cents")
out["view_exact"] = bool(
    got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
)
print(json.dumps(out))
