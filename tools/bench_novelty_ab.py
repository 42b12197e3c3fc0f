"Interleaved ABBA for the r13 novelty rework: the pre-r13 groupBy + self-join first-writer index (inlined) vs the shipped window-min form. Usage: python tools/bench_novelty_ab.py <sf_dir>."
import os
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import Window, functions as F
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.analytics import shingle_set
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab

def old_novelty(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_set(docs, "doc_id", "text", 3, distinct=True)
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    j = sh.join(firsts, "shingle")
    return (j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)).cast("long").alias("n_novel"))
        .select("doc_id", "n_shingles", "n_novel",
                F.expr("1000 * n_novel div n_shingles").cast("long").alias("novelty_x1000")))

sf_dir = sys.argv[1]
spark = get_spark("novelty-ab")
spark.sparkContext.setLogLevel("ERROR")
_small = "/testdata/" in sf_dir
spark.conf.set("spark.sql.shuffle.partitions", "8" if _small else os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark.conf.set("spark.sql.adaptive.enabled", "false" if _small else "true")  # r14: bench profile only at bench SF
old_df = old_novelty(spark, sf_dir)
new_df = QUERIES["docs_novelty_scores"](spark, sf_dir)
a = old_df.exceptAll(new_df).count(); b = new_df.exceptAll(old_df).count()
print("exceptAll", a, b); assert a == 0 and b == 0
run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())
interleaved_ab("old join  ", run(old_df), "new window", run(new_df))
