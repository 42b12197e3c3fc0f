"""r14: docs_semantic_neardup(_scaled) referenced the IVF+cosine pair
subtree twice (inter derivation + final left-join back) and the shingle
set three times (a side, b side, sizes x2 via joins) — 20 exchanges /
16 scans analyzed, 3.2 s warm at sf0.1. Variant: LEFT-join the shingle
sides so every pair row survives the one aggregate (inter = matched
b-rows, n1 = the group's own a-side row count), leaving a single sizes
join for n2 — pairs referenced once, two joins instead of four.
Usage:

    python tools/bench_semantic_ab.py <sf_dir> [--reps N] [--plans]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.analytics import ivf_assign, neardup_pairs, shingle_set
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab


def one_pass_variant(spark, sf_dir, n_cents):
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    cents = emb.filter(F.col("vec_id") < n_cents).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding")
    )
    assigned = ivf_assign(emb, cents).select("vec_id", "centroid_id")
    pairs = neardup_pairs(
        emb.join(assigned, "vec_id"), block_col="centroid_id", min_cos_x1e6=350_000
    )
    sh = shingle_set(docs, "doc_id", "text", 3, distinct=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id1"), F.col("shingle").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id2b"), F.col("shingle").alias("sh_b"))
    g = (
        pairs.join(a, "id1", "left")
        .join(b, (F.col("id2") == F.col("id2b")) & (F.col("sh_b") == F.col("sh_a")), "left")
        .drop("id2b")
        .groupBy("id1", "id2")
        .agg(
            F.max("cos_x1e6").alias("cos_x1e6"),
            F.count("sh_b").alias("inter"),
            F.count("sh_a").alias("n1"),
        )
    )
    jx = F.coalesce(
        F.floor(F.lit(1000.0) * F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))),
        F.lit(0),
    ).cast("long")
    return (
        g.join(sizes.select(F.col("doc_id").alias("id2"), F.col("n").alias("n2")), "id2")
        .select(
            "id1",
            "id2",
            "cos_x1e6",
            jx.alias("jaccard_x1000"),
            (jx >= 500).alias("lexical_confirmed"),
        )
    )


def stats(df):
    p = df._jdf.queryExecution().executedPlan().toString()
    return f"scans={p.count('FileScan')} exch={p.count('Exchange') - p.count('BroadcastExchange')} reused={p.count('ReusedExchange')}"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("sem-ab")
    spark.sparkContext.setLogLevel("ERROR")
    _small = "/testdata/" in sf_dir
    spark.conf.set("spark.sql.shuffle.partitions", "8" if _small else os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.adaptive.enabled", "false" if _small else "true")

    for qname, n_cents in (("docs_semantic_neardup", 8), ("docs_semantic_neardup_scaled", 64)):
        cur = QUERIES[qname](spark, sf_dir)
        v = one_pass_variant(spark, sf_dir, n_cents)
        if "--plans" in sys.argv:
            print(f"{qname} A:", stats(cur))
            print(f"{qname} B:", stats(v))
        da, db = v.exceptAll(cur).count(), cur.exceptAll(v).count()
        print(qname, "exceptAll", da, db)
        assert da == 0 and db == 0
        assert v.schema == cur.schema, (qname, v.schema, cur.schema)
        run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())  # noqa: E731
        interleaved_ab(f"A rejoin  {n_cents:3d}", run(cur), f"B one-pass {n_cents:2d}", run(v), reps=reps)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
