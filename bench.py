"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Methodology (matches BASELINE.md "Recorded bench" section):

* **Steady-state, both engines.** Each Spark plan is warmed once at
  sf0.001 (codegen caches key on plan STRUCTURE, so the compile cost
  leaves the timed region) and once at the target SF (file listing /
  parquet footer caches), then timed as the median of 3 full
  re-executions. The DuckDB oracle baseline is measured the same way
  in the same process — warm once, median of 3 — so the reported
  per-query ratios are same-host, same-load, warm-vs-warm.
* **Small-input profile.** At sf<=0.2 (~100 MB working set) the run
  uses 8 shuffle partitions and disables AQE: AQE's value is runtime
  re-planning of large shuffles, and at this scale its extra plan
  round costs more wall than it saves (~20%/query measured). These are
  bench-scale knobs only — `get_spark` defaults (AQE on, skew-join
  splitting, partitions=cores) are the cluster configuration and are
  untouched for sf>0.2.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iotdatapipeline_spark import get_spark  # noqa: E402
from iotdatapipeline_spark.plans import ORACLE, QUERIES  # noqa: E402
from iotdatapipeline_spark.sources import TABLES  # noqa: E402

HEADLINE = [
    "production_shift_rollup",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "dedup_combine_parts",
    "top1_active_record",
    "events_sessionization",
    # analytics extensions (skipped automatically if not yet registered)
    "docs_minhash_lsh_pairs",
    "docs_exact_dedup",
    "embeddings_knn_bruteforce",
    "docs_token_stats",
]

#: Tiny-scale warmup dir (codegen cache priming; see module docstring).
WARMUP_SF_DIR = "/root/testdata/sf0.001"

REPS = 3


def median_time(fn, reps: int = REPS) -> float:
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf_name)
    except ValueError:
        sf = None
    spark = get_spark("iotdatapipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")

    if sf is not None and sf <= 0.2:
        # small-input profile (see module docstring) — bench-scale only
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    names = [n for n in HEADLINE if n in QUERIES]

    # warmup: JVM start, codegen compile (sf0.001), then target-SF file
    # metadata caches — all one-time costs, outside the timed region
    for name in names:
        if os.path.isdir(WARMUP_SF_DIR):
            QUERIES[name](spark, WARMUP_SF_DIR).count()
        QUERIES[name](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        timings[name] = median_time(df.count)
    total = round(sum(timings.values()), 3)

    # same-host DuckDB oracle baseline, identical warm/median protocol
    duck: dict[str, float] = {}
    try:
        import duckdb

        con = duckdb.connect()
        con.sql(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name in names:
            if name not in ORACLE:
                continue
            con.sql(ORACLE[name]).fetchall()  # warm
            duck[name] = median_time(lambda n=name: con.sql(ORACLE[n]).fetchall())
        con.close()
    except Exception:
        duck = {}

    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if duck:
        duck_total = round(sum(duck.values()), 3)
        out["duckdb_queries"] = duck
        out["duckdb_total"] = duck_total
        out["ratio_vs_duckdb"] = round(total / duck_total, 2) if duck_total else None
        out["ratios"] = {
            n: round(timings[n] / duck[n], 2) for n in duck if duck.get(n)
        }
        out["method"] = (
            "steady-state median-of-3, warm plans, same host/process for both engines; "
            f"small-input profile (p=8, AQE off) at sf<=0.2"
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
