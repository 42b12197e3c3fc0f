"""Local stand-in for the driver's correctness gate: run every
``QUERIES`` entry on Spark and its ``ORACLE`` twin on DuckDB over the
same sf dir; compare row count, column names, and order-insensitive
canonicalized values. Usage:

    python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import ORACLE, QUERIES
from iotdatapipeline_spark.sources import TABLES


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("parity-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        # a table may be a single file (testdata) or a directory of
        # per-tile files (crossover datasets) — glob the latter
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in ORACLE:
            print(f"SKIP {name}: no oracle (rows={len(srows)})")
            continue
        try:
            ddf = con.sql(ORACLE[name])
            dcols = list(ddf.columns)
            drows = ddf.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sk, dk = rows_key(scols, srows), rows_key(dcols, drows)
            if sk != dk:
                ndiff = sum(1 for a, b in zip(sk, dk) if a != b)
                problems.append(f"values differ ({ndiff} of {len(sk)} rows)")
                for a, b in list(zip(sk, dk))[:2000]:
                    if a != b:
                        problems.append(f"  spark={a}\n  duck ={b}")
                        break
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
        else:
            print(f"OK   {name} ({len(srows)} rows)")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
