"""q3 runtime-Bloom-filter shoot-out at x40 (verdict r6 item 3).

The shipped q3 at x40 broadcasts the reduced dim; the measured floor
is the per-query broadcast materialization constant (BASELINE.md r3
decomposition). Hypothesis under test: a SHUFFLE_HASH plan with
Spark's runtime Bloom filter injected on l_orderkey pre-filters the
lineitem side before its exchange (only ~9% of orders survive
BUILDING∩date, so ~91% of probe rows shuffle for nothing today), and
at x40 that could beat the broadcast floor.

Injection preconditions (Spark 4 InjectRuntimeFilter): the application
side must be a SHUFFLE join (a broadcast probe is never bloom-pruned),
its scan estimate must exceed applicationSideScanSizeThreshold
(default 10GB — far above x40's ~300 MB lineitem, so the default
config NEVER fires here), and the creation side must sit under
creationSideThreshold. The tuned candidate lowers/raises those knobs.

Protocol: interleaved ABBA within one warm session (sequential timing
is cache-ordering-biased; see bench_q3_shootout.py), median of 6,
results asserted equal across candidates first.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import ensure_crossover_dir
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import _q3_inputs, interleaved_ab

TILES = int(os.environ.get("TILES", "40"))

BLOOM_CONFS = {
    # let injection consider x40-sized scans (default 10GB) and a
    # ~500k-row creation side (default 10MB estimate gate)
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10MB",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems": "4000000",
}


def _finish(li, dim):
    return (
        li.join(dim, li["l_orderkey"] == dim["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100))
            .cast("long")
            .alias("revenue_cents")
        )
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_cents"), "l_orderkey")
        .limit(10)
    )


def q3_shuffle_hash(spark, sf_dir):
    li, dim = _q3_inputs(spark, sf_dir)
    return _finish(li, dim.hint("SHUFFLE_HASH"))


def with_confs(spark, confs: dict, fn):
    old = {}
    for k, v in confs.items():
        old[k] = spark.conf.get(k)
        spark.conf.set(k, v)
    try:
        return fn()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def main() -> int:
    xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=TILES)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scratch-q3-bloom")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", cpus)

    shipped = QUERIES["q3_shipping_priority"]
    a = shipped(spark, xdir).collect()
    b = q3_shuffle_hash(spark, xdir).collect()
    c = with_confs(spark, BLOOM_CONFS, lambda: q3_shuffle_hash(spark, xdir).collect())
    assert [tuple(r) for r in a] == [tuple(r) for r in b] == [tuple(r) for r in c]
    print("results match (3 candidates)")

    # does the tuned config actually inject? look for might_contain
    plan = with_confs(
        spark, BLOOM_CONFS,
        lambda: q3_shuffle_hash(spark, xdir)._jdf.queryExecution().executedPlan().toString(),
    )
    print("bloom injected (tuned):", "bloom" in plan.lower() or "might_contain" in plan.lower())
    plan_dflt = q3_shuffle_hash(spark, xdir)._jdf.queryExecution().executedPlan().toString()
    print("bloom injected (default):", "bloom" in plan_dflt.lower() or "might_contain" in plan_dflt.lower())

    interleaved_ab(
        "shipped(bcast)", lambda: shipped(spark, xdir).count(),
        "shj+bloom     ", lambda: with_confs(spark, BLOOM_CONFS, lambda: q3_shuffle_hash(spark, xdir).count()),
    )
    interleaved_ab(
        "shj no-bloom  ", lambda: q3_shuffle_hash(spark, xdir).count(),
        "shj+bloom     ", lambda: with_confs(spark, BLOOM_CONFS, lambda: q3_shuffle_hash(spark, xdir).count()),
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
