"""Bloom point-lookup microbench: build a VersionedTable from the x10
events (key scattered against the clustering), index it, and compare a
point lookup THROUGH the bloom-pruned scan vs the full-file filter.
Reports kept/total files and median wall times for the BASELINE.md row.

Usage: python tools/bench_bloom.py [--tiles 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_crossover_dir
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.sources import load_table
from iotdatapipeline_spark.sources.versioned import VersionedTable
from pyspark.sql import functions as F


def median_of(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--n-files", type=int, default=32)
    args = ap.parse_args()

    xdir = ensure_crossover_dir(args.src, tiles=args.tiles)
    spark = get_spark("bench-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, xdir, "events").select(
        "event_id",
        "user_id",
        ((F.col("event_id") * 2654435761) % 1_000_000_000).alias("lookup_key"),
        F.floor(F.col("value") * 100).cast("long").alias("v_cents"),
    )
    root = os.path.join(tempfile.mkdtemp(prefix="bench_bloom_"), "tbl")
    t = VersionedTable(spark, root)
    t0 = time.perf_counter()
    t.create(ev, n_files=args.n_files, cluster_by=["event_id"])
    create_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    t.add_bloom_index(["lookup_key"])
    index_s = time.perf_counter() - t0

    n = t.snapshot().count()
    probe = (12345 * 2654435761) % 1_000_000_000  # event_id 12345's key
    kept, total = t.pruned_files(f"lookup_key = {probe}")

    pred = f"lookup_key = {probe}"
    bloom_s = median_of(lambda: t.scan(pred).collect())
    full_s = median_of(lambda: t.snapshot().filter(pred).collect())
    out = {
        "rows": n,
        "files": total,
        "kept": kept,
        "index_build_s": round(index_s, 3),
        "create_s": round(create_s, 3),
        "point_lookup_bloom_s": round(bloom_s, 4),
        "point_lookup_full_s": round(full_s, 4),
        "speedup": round(full_s / bloom_s, 2) if bloom_s else None,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
