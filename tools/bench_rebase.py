"""x10 row for the r12 merge REBASE: what losing a commit race costs
with logical conflict resolution vs the full optimistic retry.

Protocol: source table = 1M-row x10 events projection, event_id-keyed,
32 files. A WIDE merge (a contiguous band updating ~1/4 of the keys —
the backfill shape) is raced by a 1-row disjoint-key upsert injected
right before its commit point. Arms, interleaved ABAB in one session:

  rebase      — the r12 path: read-set validation + metadata-only
                re-commit of the finished files
  full-retry  — the same race with the rebase disabled: the merge
                re-reads and re-writes everything against the new head

Reported per arm: total merge wall seconds and how many times the
merge materialized files (_write_files calls). The claim: the race's
marginal cost under rebase is the validation (driver-side manifest +
stats work, ~constant), not a second O(touched bytes) execution.

Usage: python tools/bench_rebase.py [--tiles 10]
"""
import argparse
import json
import os
import sys
import tempfile
import time
import types

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
spark = get_spark("bench-rebase")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "32")

ev = load_table(spark, xdir, "events").select(
    F.col("event_id").alias("k"),
    (F.col("event_id") % 1000).alias("g"),
    F.floor(F.col("value") * 100).cast("long").alias("x"),
)
n = ev.count()
ev = ev.localCheckpoint(eager=True)

out = {"tiles": args.tiles, "source_rows": n, "runs": []}


def one_run(mode: str) -> dict:
    stem = tempfile.mkdtemp(prefix=f"rebase_{mode}_")
    t = VersionedTable(spark, os.path.join(stem, "t"))
    t.create(ev, n_files=32, cluster_by=["k"])
    if mode == "full-retry":
        t._rebase_merge_commit = types.MethodType(lambda self, *a, **kw: None, t)
    racer = VersionedTable(spark, t.root)
    wide = (
        t.snapshot()
        .filter((F.col("k") >= 0) & (F.col("k") < n // 4))
        .withColumn("x", F.col("x") + 1)
        .localCheckpoint(eager=True)
    )
    orig_commit = type(t)._try_commit
    orig_write = type(t)._write_files
    state = {"fired": False, "writes": 0}

    def hooked_commit(self, *a, **kw):
        if not state["fired"]:
            state["fired"] = True
            racer.merge_into(
                spark.createDataFrame([(n + 10, 1, 1)], "k bigint, g bigint, x long"),
                ["k"],
            )
        return orig_commit(self, *a, **kw)

    def counting_write(self, *a, **kw):
        state["writes"] += 1
        return orig_write(self, *a, **kw)

    t._try_commit = hooked_commit.__get__(t)
    t._write_files = counting_write.__get__(t)
    t0 = time.perf_counter()
    t.merge_into(wide, ["k"])
    wall = round(time.perf_counter() - t0, 3)
    op = t.history()[-1]["op"]
    assert ("rebase" in op) == (mode == "rebase"), op
    # correctness: the racer's row AND the wide update both landed
    got = t.snapshot().filter(F.col("k").isin(0, n + 10)).collect()
    assert len(got) == 2
    return {"mode": mode, "merge_wall_s": wall, "file_writes": state["writes"], "op": op}


for mode in ("rebase", "full-retry", "rebase", "full-retry"):
    out["runs"].append(one_run(mode))
print(json.dumps(out))
