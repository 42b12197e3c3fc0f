"""Measure the merge probe's stats pre-prune (sources/versioned.py):
a key-local MERGE against a clustered table, with and without manifest
stats — the candidate-file count and the probe/merge wall time. The
"without" leg strips the stats key from the latest manifest, which is
exactly the pre-round-6 behavior (the semi-join probe reads the whole
table).

Usage: python tools/bench_merge_prune.py [n_keys] [n_files] [pct]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iotdatapipeline_spark import get_spark  # noqa: E402
from iotdatapipeline_spark.sources.versioned import VersionedTable  # noqa: E402


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 0.02
    spark = get_spark("merge-prune-bench")
    spark.sparkContext.setLogLevel("FATAL")

    lo, hi = 0, int(n_keys * pct)  # key-local source: one contiguous range

    def build():
        root = os.path.join(tempfile.mkdtemp(prefix="mergeprune_"), "t")
        t = VersionedTable(spark, root)
        base = spark.range(n_keys).selectExpr("id AS k", "id * 2 AS v")
        t.create(base, n_files=n_files, cluster_by=["k"])
        return t

    src = spark.range(lo, hi).selectExpr("id AS k", "id * 3 AS v")
    src.count()  # warm

    results = {}
    for label, strip in (("stats_pruned", False), ("full_probe", True)):
        t = build()
        if strip:
            p = t._manifest_path(t.version())
            m = json.load(open(p))
            m["stats"] = {}
            json.dump(m, open(p, "w"))
        # count the files the probe actually opens
        opened: list[int] = []
        reader_cls = type(spark.read)
        orig = reader_cls.parquet

        def counting(self, *paths, _o=orig, _a=opened):
            _a.append(len(paths))
            return _o(self, *paths)

        reader_cls.parquet = counting
        t0 = time.perf_counter()
        t.merge_into(src, ["k"])
        wall = round(time.perf_counter() - t0, 3)
        reader_cls.parquet = orig
        m1 = t._read_manifest(t.version() - 1)
        m2 = t._read_manifest(t.version())
        results[label] = {
            "wall_s": wall,
            # opened[0] is snapshot()'s lazy full-list (schema only, no
            # job); opened[1] is the probe's candidate read — the
            # number that stats pruning shrinks
            "reads_per_call": opened,
            "files_total": n_files,
            "files_rewritten": len(set(m2["files"]) - set(m1["files"])),
        }
        got = t.snapshot().count()
        assert got == n_keys, got
    print(json.dumps({"n_keys": n_keys, "n_files": n_files, "source_pct": pct, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
