"""Interleaved ABBA for the r14 parts_triangle_counts rework: 3-way
unionAll of tri projections (re-runs the wedge joins per corner) vs one
row-local explode of [a, b, c]. Usage: python tools/bench_triangle_ab.py <sf_dir>."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.plans.behavioral import _cooccurrence_edges
from tools.bench_q3_shootout import interleaved_ab

def old_union3(spark, sf_dir):
    ed = _cooccurrence_edges(spark, sf_dir).localCheckpoint(eager=True)
    e1 = ed.select(F.col("p1").alias("a"), F.col("p2").alias("b"))
    e2 = ed.select(F.col("p1").alias("b"), F.col("p2").alias("c"))
    e3 = ed.select(F.col("p1").alias("a"), F.col("p2").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    verts = (
        tri.select(F.col("a").alias("part"))
        .unionAll(tri.select(F.col("b").alias("part")))
        .unionAll(tri.select(F.col("c").alias("part")))
    )
    return verts.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    ).select(F.col("part").alias("l_partkey"), "n_triangles")

def main():
    sf_dir = sys.argv[1]
    spark = get_spark("tri-ab"); spark.sparkContext.setLogLevel("ERROR")
    _small = "/testdata/" in sf_dir
    spark.conf.set("spark.sql.shuffle.partitions", "8" if _small else os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.adaptive.enabled", "false" if _small else "true")
    cur = QUERIES["parts_triangle_counts"](spark, sf_dir)
    v = old_union3(spark, sf_dir)
    print("exceptAll", v.exceptAll(cur).count(), cur.exceptAll(v).count())
    assert v.schema == cur.schema
    run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())
    interleaved_ab("explode (shipped)", run(cur), "union3 (old)     ", run(v), reps=5)
    spark.stop()


if __name__ == "__main__":
    main()
