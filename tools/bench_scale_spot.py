"""Scale spot rows: time named queries Spark vs DuckDB on the ×N
key-offset tiled dataset (same tiling/cache as bench.py's crossover
run). Used for the BASELINE.md amortization tables.

Usage:
    python tools/bench_scale_spot.py --tiles 80 query [query ...]

Protocol matches bench.py: cluster-profile Spark settings (AQE on,
partitions = cores), warm once per engine, median of 3.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import _duck_source, ensure_crossover_dir, median_time
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import ORACLE, QUERIES
from iotdatapipeline_spark.sources import TABLES


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=80)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    xdir = ensure_crossover_dir(args.src, tiles=args.tiles)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench-scale-spot")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    con = duckdb.connect()
    con.sql(f"SET threads TO {cpus}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {_duck_source(xdir, t)}")

    out = {"sf": round(0.1 * args.tiles, 2), "tiles": args.tiles, "rows": {}}
    for name in args.queries:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered", flush=True)
            continue
        from bench import spark_action

        spark_action(name, QUERIES[name](spark, xdir))()  # warm
        s = median_time(spark_action(name, QUERIES[name](spark, xdir)))
        d = err = None
        if name in ORACLE:
            try:
                con.sql(ORACLE[name]).fetchall()  # warm
                d = median_time(lambda n=name: con.sql(ORACLE[n]).fetchall())
            except Exception as exc:  # e.g. DuckDB OOM at scale
                err = f"{type(exc).__name__}: {exc}"
                con.close()
                con = duckdb.connect()
                con.sql(f"SET threads TO {cpus}")
                for t in TABLES:
                    con.sql(f"CREATE VIEW {t} AS SELECT * FROM {_duck_source(xdir, t)}")
        ratio = round(s / d, 2) if d else None
        row = {"spark_s": s, "duckdb_s": d, "ratio": ratio}
        if err:
            row["duckdb_error"] = err
        out["rows"][name] = row
        print(f"{name}: spark={s}s duckdb={d}s ratio={ratio} {err or ''}", flush=True)
    con.close()
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
