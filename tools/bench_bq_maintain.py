"""Pin BqVectorIndex.refresh()'s O(changed vectors) claim at scale
(r12).

Protocol: source VersionedTable = the tiled embeddings corpus
(vec_id-clustered). Seed the maintained index (that cost == what a
full rebuild pays every time), then update bands of GROWING changed-
vector counts (negate every dim — all sign bits flip) and refresh
after each. The claim: refresh tracks the band, not the corpus — the
rebuild-per-change alternative pays the seed cost on EVERY change.
Final index == from-scratch repack asserted.

Usage: python tools/bench_bq_maintain.py [--tiles 160]
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
from iotdatapipeline_spark.analytics.similarity import binary_quantize
from iotdatapipeline_spark.matview import BqVectorIndex
from iotdatapipeline_spark.sources import load_table
from iotdatapipeline_spark.sources.versioned import VersionedTable

ap = argparse.ArgumentParser()
ap.add_argument("--tiles", type=int, default=160)
args = ap.parse_args()

xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=args.tiles)
spark = get_spark("bench-bq-maintain")
spark.sparkContext.setLogLevel("FATAL")
spark.conf.set("spark.sql.shuffle.partitions", "32")

stem = tempfile.mkdtemp(prefix="bqmaint_scale_")
emb = load_table(spark, xdir, "embeddings").select("vec_id", "embedding")
n = emb.count()
src = VersionedTable(spark, os.path.join(stem, "src"))
src.create(emb, n_files=32, cluster_by=["vec_id"])

t0 = time.perf_counter()
idx = BqVectorIndex.create(spark, os.path.join(stem, "idx"), os.path.join(stem, "src"))
seed_s = round(time.perf_counter() - t0, 3)

out = {"tiles": args.tiles, "corpus_vectors": n, "seed_s": seed_s, "refreshes": []}
lo = 0
for band in (100, 10_000, 100_000):
    upd = (
        src.snapshot()
        .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + band))
        .withColumn("embedding", F.transform("embedding", lambda x: -x))
    )
    lo += band
    src.merge_into(upd, ["vec_id"])
    t0 = time.perf_counter()
    idx.refresh()
    dt = round(time.perf_counter() - t0, 3)
    out["refreshes"].append({"changed_vectors": band, "refresh_s": dt})

# the alternative every non-maintained index pays: full rebuild
t0 = time.perf_counter()
rb = VersionedTable(spark, os.path.join(stem, "rebuild"))
rb.create(binary_quantize(src.snapshot()), n_files=32, cluster_by=["vec_id"])
out["full_rebuild_s"] = round(time.perf_counter() - t0, 3)

got = idx.table().snapshot().select("vec_id", "bq")
want = binary_quantize(src.snapshot())
out["index_exact"] = bool(
    got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
)
print(json.dumps(out))
