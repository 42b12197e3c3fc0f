"""ABBA harness for the r13 window reworks of events_funnel_stages,
events_cohort_retention, and docs_word_rarity: times the registered
(new) form against the previous join form, interleaved, noop sink,
bench small-input profile.

Usage: python tools/bench_behavioral_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iotdatapipeline_spark import get_spark  # noqa: E402
from iotdatapipeline_spark.plans import QUERIES  # noqa: E402
from iotdatapipeline_spark.plans.analytics import words  # noqa: E402
from iotdatapipeline_spark.sources import load_table  # noqa: E402


def old_funnel(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    stages, window_expr = ("view", "click", "purchase"), "INTERVAL 48 HOURS"
    prior = (
        ev.filter(F.col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    result = prior
    for i, stage in enumerate(stages[1:], start=2):
        tcol, out = f"t{i - 1}", f"t{i}"
        e = ev.filter(F.col("event_type") == stage).select("user_id", "ts")
        nxt = (
            e.join(result.select("user_id", tcol), "user_id")
            .filter(
                (F.col("ts") >= F.col(tcol))
                & (F.col("ts") < F.col(tcol) + F.expr(window_expr))
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )
        result = result.join(nxt, "user_id", "left")
    return result.select("user_id", "t1", "t2", "t3")


def old_cohort(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    first = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.col("d0").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("d0")).cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def old_word_rarity(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    dw = docs.select("doc_id", F.explode(words(F.col("text"))).alias("w")).distinct()
    df_tbl = dw.groupBy("w").agg(F.count(F.lit(1)).alias("doc_freq"))
    return (
        dw.join(df_tbl, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.floor(1000.0 * F.sum("doc_freq") / F.count(F.lit(1))).cast("long").alias("mean_df_x1000"),
            F.min("doc_freq").cast("long").alias("rarest_df"),
        )
    )


PAIRS = {
    "events_funnel_stages": old_funnel,
    "events_cohort_retention": old_cohort,
    "docs_word_rarity": old_word_rarity,
}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    only = sys.argv[3:] or list(PAIRS)
    spark = get_spark("behavioral-ab")
    spark.sparkContext.setLogLevel("ERROR")
    _small = "/testdata/" in sf_dir
    spark.conf.set("spark.sql.shuffle.partitions", "8" if _small else os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.adaptive.enabled", "false" if _small else "true")  # r14: bench profile only at bench SF
    for name in only:
        new = QUERIES[name](spark, sf_dir)
        old = PAIRS[name](spark, sf_dir)
        for df in (new, old):  # warm
            noop(df)
            noop(df)
        ns, os_ = [], []
        for _ in range(reps):  # interleaved ABBA
            t0 = time.perf_counter(); noop(new); ns.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); noop(old); os_.append(time.perf_counter() - t0)
        for _ in range(1):
            t0 = time.perf_counter(); noop(old); os_.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); noop(new); ns.append(time.perf_counter() - t0)
        print(
            f"{name}: new median={statistics.median(ns):.3f} old median={statistics.median(os_):.3f} "
            f"new={[round(s, 3) for s in ns]} old={[round(s, 3) for s in os_]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
