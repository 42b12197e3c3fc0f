"""Pin IVM tier 3 (direct aggregate-over-join) at x10 scale (r13).

The claim: maintaining ``SELECT grp, COUNT(*), SUM(v_cents) FROM
fact JOIN dim USING (station) GROUP BY grp`` with
``AggJoinMaterializedView`` costs O(Δ ⋈ affected) per refresh and
stores O(groups) — with NO stored join table — where the two honest
alternatives pay more in different currencies, measured in one
interleaved session:

* STACKED (the r12 shape this tier replaces): a JoinMaterializedView
  materializing the FULL fact⋈dim, under a SUM/COUNT view following
  its change feed. Per band it pays the row-level join maintenance
  PLUS the aggregate maintenance, and its intermediate mart stores
  every joined row — the storage/write-amplification observable
  reported as on-disk bytes at the end.
* RECOMPUTE: the nightly job — full join + re-aggregate + rewrite of
  a twin table, O(fact) every run regardless of band size.

Bands are contiguous STATION ranges (fact clustered by station, the
star-schema co-location), growing 10k → 100k → 500k changed fact
rows, plus one DIM step (regrouping 500 stations) that exercises the
A_old ⋈ ΔB term against ~33k affected fact rows. All three arms are
asserted equal to the direct aggregate at the end.

Usage: python tools/bench_ivm_agg_join.py [--tiles 10]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import ensure_crossover_dir
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.matview import (
    AggJoinMaterializedView,
    JoinMaterializedView,
    MaterializedView,
)
from iotdatapipeline_spark.sources import load_table
from iotdatapipeline_spark.sources.versioned import VersionedTable

ap = argparse.ArgumentParser()
ap.add_argument("--tiles", type=int, default=10)
args = ap.parse_args()

xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=args.tiles)
spark = get_spark("bench-ivm-agg-join")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "32")

stem = tempfile.mkdtemp(prefix="aggjoin_scale_")
ev = load_table(spark, xdir, "events").select(
    "event_id",
    F.col("user_id").alias("station"),
    F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
)
n = ev.count()
fact = VersionedTable(spark, os.path.join(stem, "fact"))
fact.create(ev, n_files=32, cluster_by=["station"])
dim_df = ev.select("station").distinct().withColumn(
    "grp", F.col("station") % 256
)
dim = VersionedTable(spark, os.path.join(stem, "dim"))
dim.create(dim_df, n_files=4, cluster_by=["station"])
n_stations = dim_df.count()

def du(path: str) -> int:
    return int(
        subprocess.run(["du", "-sb", path], capture_output=True, text=True)
        .stdout.split()[0]
    )

t0 = time.perf_counter()
direct = AggJoinMaterializedView.create(
    spark, os.path.join(stem, "direct"),
    os.path.join(stem, "fact"), os.path.join(stem, "dim"),
    join_keys=["station"], group_by=["grp"], sum_cols=["v_cents"],
    a_key="event_id", b_key="station",
)
direct_seed_s = round(time.perf_counter() - t0, 3)

t0 = time.perf_counter()
stack_join = JoinMaterializedView.create(
    spark, os.path.join(stem, "stack_join"),
    os.path.join(stem, "fact"), os.path.join(stem, "dim"),
    join_keys=["station"], a_key="event_id", b_key="station",
)
stack_agg = MaterializedView.create(
    spark, os.path.join(stem, "stack_agg"), os.path.join(stem, "stack_join"),
    group_by=["grp"], sum_cols=["v_cents"], keys=["event_id"],
)
stack_seed_s = round(time.perf_counter() - t0, 3)

out = {
    "tiles": args.tiles,
    "fact_rows": n,
    "stations": n_stations,
    "direct_seed_s": direct_seed_s,
    "stack_seed_s": stack_seed_s,
    "bands": [],
}

def band_step(tag, mutate):
    mutate()
    t0 = time.perf_counter()
    direct.refresh()
    direct_s = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    stack_join.refresh()
    stack_agg.refresh()
    stack_s = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    full = (
        fact.snapshot()
        .join(dim.snapshot(), "station")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("v_cents").cast("long").alias("sum_v_cents"),
        )
    )
    tw = os.path.join(stem, f"recompute_{tag}")
    VersionedTable(spark, tw).create(full, cluster_by=["grp"])
    rec_s = round(time.perf_counter() - t0, 3)
    out["bands"].append(
        {"band": tag, "direct_s": direct_s, "stacked_s": stack_s,
         "recompute_s": rec_s}
    )

for lo, width in ((0, 150), (1500, 1500), (4500, 7500)):
    def fact_band(lo=lo, width=width):
        upd = (
            fact.snapshot()
            .filter((F.col("station") >= lo) & (F.col("station") < lo + width))
            .withColumn("v_cents", F.col("v_cents") + 1)
        )
        fact.merge_into(upd, ["event_id"])
    band_step(f"fact_stations_{width}", fact_band)

def dim_band():
    upd = (
        dim.snapshot()
        .filter(F.col("station") < 500)
        .withColumn("grp", F.col("grp") + 256)
    )
    dim.merge_into(upd, ["station"])
band_step("dim_regroup_500", dim_band)

# storage: the whole point — the direct view never stores the join
out["bytes_direct_view"] = du(os.path.join(stem, "direct"))
out["bytes_stacked_join_mart"] = du(os.path.join(stem, "stack_join"))
out["bytes_stacked_agg"] = du(os.path.join(stem, "stack_agg"))

want = (
    fact.snapshot()
    .join(dim.snapshot(), "station")
    .groupBy("grp")
    .agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("v_cents").cast("long").alias("sum_v_cents"),
    )
)
d = direct.snapshot().select("grp", "cnt", "sum_v_cents")
s = stack_agg.snapshot().select("grp", "cnt", "sum_v_cents")
out["direct_exact"] = bool(
    d.exceptAll(want).isEmpty() and want.exceptAll(d).isEmpty()
)
out["stacked_exact"] = bool(
    s.exceptAll(want).isEmpty() and want.exceptAll(s).isEmpty()
)
print(json.dumps(out))
