"Interleaved ABBA for the r13 jaccard_pairs rework: the pre-r13 shingle self-join (inlined) vs the shipped bucket-grouping pair expansion. Usage: python tools/bench_jaccard_ab.py <sf_dir> [--plans]."
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.analytics.dedup import exploded_shingles
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab


def old_jaccard(spark, sf_dir, id_col="doc_id", block_col="source", min_jaccard_x1000=10):
    docs = load_table(spark, sf_dir, "documents")
    shingles = exploded_shingles(docs, "doc_id", "text", 3, extra_cols=("source",)).distinct()
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    join_cond = [
        F.col("a.shingle") == F.col("b.shingle"),
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
        F.col(f"a.{block_col}") == F.col(f"b.{block_col}"),
    ]
    inter = (
        shingles.alias("a")
        .join(shingles.alias("b"), join_cond)
        .groupBy(F.col(f"a.{id_col}").alias("doc1"), F.col(f"b.{id_col}").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col(id_col).alias("doc1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("doc2"), F.col("n").alias("n2"))
    out = (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn(
            "jaccard_x1000",
            F.floor(
                F.lit(1000.0) * F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
            ).cast("long"),
        )
    )
    return out.filter(F.col("jaccard_x1000") >= min_jaccard_x1000).select(
        "doc1", "doc2", "inter", "jaccard_x1000"
    )


sf_dir = sys.argv[1]
spark = get_spark("jaccard-ab")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "8")
spark.conf.set("spark.sql.adaptive.enabled", "false")
old_df = old_jaccard(spark, sf_dir)
new_df = QUERIES["docs_jaccard_pairs"](spark, sf_dir)
if "--plans" in sys.argv:
    fmt = lambda df: df._sc._jvm.PythonSQLUtils.explainString(  # noqa: E731
        df._jdf.queryExecution(), "formatted"
    )
    with open("plans/r13/docs_jaccard_pairs_before.txt", "w") as f:
        f.write(fmt(old_df))
    with open("plans/r13/docs_jaccard_pairs_after.txt", "w") as f:
        f.write(fmt(new_df))
    print("plans written")
a = old_df.exceptAll(new_df).count()
b = new_df.exceptAll(old_df).count()
print("exceptAll", a, b)
assert a == 0 and b == 0
assert old_df.schema == new_df.schema, (old_df.schema, new_df.schema)
run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())  # noqa: E731
interleaved_ab("old selfjoin", run(old_df), "new buckets ", run(new_df))
