"""q3 plan shoot-out at scale: pre-aggregation rewrite vs the shipped
plan, plus a component decomposition of the wall time.

The candidate aggregates lineitem by l_orderkey BEFORE the join (legal
because o_orderdate/o_orderpriority are functionally dependent on the
join key, which is unique on the dim side), hoping to shrink the big
exchange ~4x. Measured at x160 (sf16) it is RATIO-NEUTRAL
(3.25 s shipped vs 3.26 s pre-agg): with the runtime Bloom filter on
(spark.sql.optimizer.runtime.bloomFilter.enabled=true by default in
Spark 4) the shipped join already prunes the probe side before the
exchange, and the pre-agg variant replaces that with an equally
expensive high-cardinality (~14 M group) exchange. Decomposition at
x160: lineitem scan+filter 0.89 s, scan+orderkey-agg 2.53 s, dim
build 1.16 s — the 3.25 s total is the overlapped sum of engine scan
and exchange floors, confirming the documented-floor verdict rather
than a missed plan alternative.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import ensure_crossover_dir, median_time
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table, table_bytes

TILES = int(os.environ.get("TILES", "160"))


def q3_preagg(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    dim = orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li_agg = li.groupBy("l_orderkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100))
        .cast("long")
        .alias("revenue_cents")
    )
    if table_bytes(sf_dir, "orders") <= 64 << 20:
        dim = F.broadcast(dim)
    return (
        li_agg.join(dim, li_agg["l_orderkey"] == dim["o_orderkey"])
        .select("l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_cents"), "l_orderkey")
        .limit(10)
    )


def main() -> int:
    xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=TILES)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scratch-q3")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        print("bloom:", spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"))
    except Exception:
        pass

    cur = QUERIES["q3_shipping_priority"]
    a = cur(spark, xdir).collect()
    b = q3_preagg(spark, xdir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], (a[:3], b[:3])
    print("results match")

    s_cur = median_time(lambda: cur(spark, xdir).count())
    s_new = median_time(lambda: q3_preagg(spark, xdir).count())
    print(f"tiles={TILES}: current={s_cur}s preagg={s_new}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
