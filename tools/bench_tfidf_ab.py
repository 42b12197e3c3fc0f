"Interleaved ABBA for the r13 TF-IDF rework: the pre-r13 groupBy(term) + join-back document-frequency (inlined) vs the shipped window-count form. Usage: python tools/bench_tfidf_ab.py <sf_dir>."
import os
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import Window, functions as F
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab

def old_tfidf(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = terms.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("df"), F.asc("term"))
    scored = (tf.join(df, "term").crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("score_x1000", F.floor(F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) * 1000).cast("long")))
    return scored.filter(F.col("rank") <= 3).select(
        "doc_id", "term", F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"), "rank", "score_x1000")

sf_dir = sys.argv[1]
spark = get_spark("tfidf-ab")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "8")
spark.conf.set("spark.sql.adaptive.enabled", "false")
old_df = old_tfidf(spark, sf_dir)
new_df = QUERIES["docs_tfidf_top_terms"](spark, sf_dir)
a = old_df.exceptAll(new_df).count(); b = new_df.exceptAll(old_df).count()
print("exceptAll", a, b); assert a == 0 and b == 0
run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())
interleaved_ab("old join  ", run(old_df), "new window", run(new_df))
