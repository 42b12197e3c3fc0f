"Interleaved ABBA for the r13 q21 rework: the pre-r13 per-order aggregate joined back on l_orderkey (inlined) vs the shipped distinct-count window form. Usage: python tools/bench_q21_ab.py <sf_dir> [--plans]."
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab


def old_q21(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    flagged = per_order.filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
    lr = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    o_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lr.join(o_f, lr["l_orderkey"] == o_f["o_orderkey"])
        .join(flagged, lr["l_orderkey"] == flagged["okey"])
        .join(F.broadcast(s), lr["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


sf_dir = sys.argv[1]
spark = get_spark("q21-ab")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "8")
spark.conf.set("spark.sql.adaptive.enabled", "false")
old_df = old_q21(spark, sf_dir)
new_df = QUERIES["q21_sole_blame_supplier"](spark, sf_dir)
if "--plans" in sys.argv:
    fmt = lambda df: df._sc._jvm.PythonSQLUtils.explainString(  # noqa: E731
        df._jdf.queryExecution(), "formatted"
    )
    with open("plans/r13/q21_sole_blame_supplier_before.txt", "w") as f:
        f.write(fmt(old_df))
    with open("plans/r13/q21_sole_blame_supplier_after.txt", "w") as f:
        f.write(fmt(new_df))
    print("plans written")
a = old_df.exceptAll(new_df).count()
b = new_df.exceptAll(old_df).count()
print("exceptAll", a, b)
assert a == 0 and b == 0
assert old_df.schema == new_df.schema, (old_df.schema, new_df.schema)
run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())  # noqa: E731
interleaved_ab("old agg+join", run(old_df), "new window  ", run(new_df))
