"""x40 re-measure of the r13-rejected docs_collocations rollup
(VERDICT r13 item 7): derive the unigram margins and the total from
the (w1, w2) pair aggregate (ReusedExchange runs the corpus explode
once) vs the shipped 4-pass form (each margin partial-aggregates
map-side on the raw exploded stream). Usage:

    python tools/bench_collocations_ab.py <sf_dir> [--reps N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import Window
from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab


def rollup_variant(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ws = F.col("__ws")
    bg = (
        docs.select(F.split(F.col("text"), " ").alias("__ws"))
        .select(F.explode(F.sequence(F.lit(1), F.array_size(ws) - 1)).alias("__i"), "__ws")
        .select(
            F.element_at(ws, F.col("__i")).alias("w1"),
            F.element_at(ws, F.col("__i") + 1).alias("w2"),
        )
    )
    pairs = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    nab = pairs.filter(F.col("n_ab") >= 5)
    na = pairs.groupBy("w1").agg(F.sum("n_ab").alias("n_a"))
    nb = pairs.groupBy("w2").agg(F.sum("n_ab").alias("n_b"))
    tot = pairs.agg(F.sum("n_ab").alias("n"))
    scored = (
        nab.join(na, "w1")
        .join(nb, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.expr("1000 * n_ab * n div (n_a * n_b)").cast("long").alias("lift_x1000"),
        )
    )
    w = Window.orderBy(F.desc("lift_x1000"), F.asc("w1"), F.asc("w2"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 50)
        .select("w1", "w2", "n_ab", "lift_x1000", "rank")
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("collocations-ab")
    spark.sparkContext.setLogLevel("ERROR")
    _small = "/testdata/" in sf_dir
    spark.conf.set("spark.sql.shuffle.partitions", "8" if _small else os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.adaptive.enabled", "false" if _small else "true")

    cur = QUERIES["docs_collocations"](spark, sf_dir)
    rl = rollup_variant(spark, sf_dir)
    da, db = rl.exceptAll(cur).count(), cur.exceptAll(rl).count()
    print("exceptAll", da, db)
    assert da == 0 and db == 0

    run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())  # noqa: E731
    interleaved_ab("4-pass margins", run(cur), "pair rollup   ", run(rl), reps=reps)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
