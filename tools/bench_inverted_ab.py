"Interleaved ABBA for the r13 inverted-index rework: the pre-r13 groupBy(term) doc_freq + join-back (inlined) vs the shipped window-count form. Usage: python tools/bench_inverted_ab.py <sf_dir> [--plans]."
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import Window, functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab


def old_inverted(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    td = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"), "doc_id")
        .distinct()
    )
    dfreq = td.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
    w = Window.partitionBy("term").orderBy("doc_id")
    head = (
        td.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .groupBy("term")
        .agg(F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias("postings_head"))
    )
    return (
        dfreq.filter(F.col("doc_freq") >= 10)
        .join(head, "term")
        .select("term", "doc_freq", "postings_head")
    )


sf_dir = sys.argv[1]
spark = get_spark("inverted-ab")
spark.sparkContext.setLogLevel("ERROR")
_small = "/testdata/" in sf_dir
spark.conf.set("spark.sql.shuffle.partitions", "8" if _small else os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark.conf.set("spark.sql.adaptive.enabled", "false" if _small else "true")  # r14: bench profile only at bench SF
old_df = old_inverted(spark, sf_dir)
new_df = QUERIES["docs_inverted_index"](spark, sf_dir)
if "--plans" in sys.argv:
    fmt = lambda df: df._sc._jvm.PythonSQLUtils.explainString(  # noqa: E731
        df._jdf.queryExecution(), "formatted"
    )
    with open("plans/r13/docs_inverted_index_before.txt", "w") as f:
        f.write(fmt(old_df))
    with open("plans/r13/docs_inverted_index_after.txt", "w") as f:
        f.write(fmt(new_df))
    print("plans written")
a = old_df.exceptAll(new_df).count()
b = new_df.exceptAll(old_df).count()
print("exceptAll", a, b)
assert a == 0 and b == 0
assert old_df.schema == new_df.schema, (old_df.schema, new_df.schema)
run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())  # noqa: E731
interleaved_ab("old join  ", run(old_df), "new window", run(new_df))
