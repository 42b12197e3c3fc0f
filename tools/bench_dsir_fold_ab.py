"""Interleaved ABBA for the r13 DSIR pass-2 rework: the pre-r13
row-local F.aggregate fold (inlined verbatim below — higher-order
functions evaluate interpreted / CodegenFallback) vs the shipped
codegen explode + element_at + partial-agg scoring. Results asserted
identical first (exceptAll both ways), then noop-sink interleaved
median-of-6.

Usage: python tools/bench_dsir_fold_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.analytics.text import words
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab


def _bucket(g):
    return F.conv(F.substring(F.md5(g.cast("binary")), 1, 8), 16, 10).cast("long") % 256


def _model(docs, cnt):
    dist = (
        docs.select("lang", "__ws", F.explode(F.sequence(F.lit(1), cnt)).alias("i"))
        .select("lang", _bucket(F.array_join(F.slice("__ws", F.col("i"), 2), " ")).alias("f"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("rc"), F.count_if(F.col("lang") == "en").alias("tc"))
    )
    return F.broadcast(
        dist.select("f", F.expr("(1000 * (tc + 1)) div (rc + 1)").alias("s"))
        .agg(F.map_from_entries(F.collect_list(F.struct("f", "s"))).alias("m0"))
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(255)),
                lambda i: F.coalesce(
                    F.element_at(F.col("m0"), i.cast("bigint")), F.lit(0).cast("long")
                ),
            ).alias("m")
        )
    )


def old_fold(spark, sf_dir):
    """The pre-r13 shipped shape: zero-exchange scoring via an
    interpreted per-gram F.aggregate fold."""
    docs = load_table(spark, sf_dir, "documents").withColumn("__ws", words(F.col("text")))
    cnt = F.greatest(F.array_size("__ws") - F.lit(1), F.lit(1))
    return docs.crossJoin(_model(docs, cnt)).select(
        "doc_id",
        cnt.cast("long").alias("n_grams"),
        F.aggregate(
            F.sequence(F.lit(1), cnt),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.element_at(
                F.col("m"),
                (_bucket(F.array_join(F.slice("__ws", i, 2), " ")) + 1).cast("int"),
            ),
        ).alias("dsir_weight"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dsir-fold-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    old_df = old_fold(spark, sf_dir)
    new_df = QUERIES["docs_dsir_weights"](spark, sf_dir)
    a = old_df.exceptAll(new_df).count()
    b = new_df.exceptAll(old_df).count()
    print("exceptAll", a, b)
    assert a == 0 and b == 0
    run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())  # noqa: E731
    interleaved_ab("interpreted fold", run(old_df), "codegen explode ", run(new_df))


if __name__ == "__main__":
    main()
