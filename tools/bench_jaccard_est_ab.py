"""Interleaved ABBA for the r14 docs_minhash_jaccard_estimate rework:
the r13 per-branch re-execution form (inlined below) vs the shipped
one-aggregate + carried-payload form. Usage:

    python tools/bench_jaccard_est_ab.py <sf_dir> [--plans] [--reps N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.analytics.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_set,
)
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab


def old_estimate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_set(docs, "doc_id", "text", n=3, distinct=True)
    sigs = minhash_signatures(sh, "doc_id", k=8)
    cand = lsh_candidate_pairs(sigs, "doc_id", k=8, rows_per_band=2)
    m1 = sigs.select(F.col("doc_id").alias("doc1"), *[F.col(f"h{i}").alias(f"h{i}_1") for i in range(8)])
    m2 = sigs.select(F.col("doc_id").alias("doc2"), *[F.col(f"h{i}").alias(f"h{i}_2") for i in range(8)])
    matches = sum(
        F.when(F.col(f"h{i}_1") == F.col(f"h{i}_2"), 1).otherwise(0) for i in range(8)
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = sh.select(F.col("doc_id").alias("doc1"), "shingle")
    s2 = sh.select(F.col("doc_id").alias("doc2"), "shingle")
    inter = (
        cand.join(s1, "doc1")
        .join(s2, ["doc2", "shingle"])
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    z1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n1"))
    z2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2"))
    out = (
        cand.join(m1, "doc1")
        .join(m2, "doc2")
        .join(z1, "doc1")
        .join(z2, "doc2")
        .join(inter, ["doc1", "doc2"], "left")
        .withColumn("inter", F.coalesce(F.col("inter"), F.lit(0)))
    )
    return out.select(
        "doc1",
        "doc2",
        F.floor(1000.0 * matches / 8).cast("long").alias("est_x1000"),
        F.floor(1000.0 * F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")))
        .cast("long")
        .alias("jaccard_x1000"),
    )


sf_dir = sys.argv[1]
reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 6
spark = get_spark("jaccard-est-ab")
spark.sparkContext.setLogLevel("ERROR")
_small = "/testdata/" in sf_dir
spark.conf.set("spark.sql.shuffle.partitions", "8" if _small else os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark.conf.set("spark.sql.adaptive.enabled", "false" if _small else "true")  # r14: bench profile only at bench SF
old_df = old_estimate(spark, sf_dir)
new_df = QUERIES["docs_minhash_jaccard_estimate"](spark, sf_dir)
if "--plans" in sys.argv:
    fmt = lambda df: df._sc._jvm.PythonSQLUtils.explainString(  # noqa: E731
        df._jdf.queryExecution(), "formatted"
    )
    with open("plans/r14/docs_minhash_jaccard_estimate_after.txt", "w") as f:
        f.write(fmt(new_df))
    print("plans written")
a = old_df.exceptAll(new_df).count()
b = new_df.exceptAll(old_df).count()
print("exceptAll", a, b)
assert a == 0 and b == 0
assert old_df.schema == new_df.schema, (old_df.schema, new_df.schema)
run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())  # noqa: E731
interleaved_ab("old per-branch", run(old_df), "new one-agg   ", run(new_df), reps=reps)
