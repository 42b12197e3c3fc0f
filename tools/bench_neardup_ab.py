"""r14: docs_neardup_resolved's analyzed plan is 115 exchanges / 40
scans — `verified` (the whole LSH->jaccard-verify pipeline) is
referenced 4x by the union-built edge list and the edge list twice by
the two label-propagation rounds. Variants:

  A (shipped r13): 4-way unionAll edges.
  B: edges from ONE row-local explode of 4 (src, dst) structs
     (verified referenced 2x instead of 8x).
  C: B + localCheckpoint(eager=False) on verified (referenced 1x; the
     pair list is tiny).

Usage: python tools/bench_neardup_ab.py <sf_dir> [--reps N] [--plans]
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


def _verified(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh_nd = shingle_set(docs, "doc_id", "text", n=3, distinct=False)
    cands = lsh_candidate_pairs(minhash_signatures(sh_nd, "doc_id", k=8), "doc_id", k=8, rows_per_band=2)
    sh = shingle_set(docs, "doc_id", "text", n=3, distinct=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cands.join(sh.alias("a"), F.col("a.doc_id") == F.col("doc1"))
        .join(sh.alias("b"), (F.col("b.doc_id") == F.col("doc2")) & (F.col("b.shingle") == F.col("a.shingle")))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2"))
    return (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .filter(F.lit(1000.0) * F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")) >= 800)
        .select("doc1", "doc2")
    )


def _resolve(verified):
    edges = verified.select(
        F.explode(
            F.array(
                F.struct(F.col("doc1").alias("src"), F.col("doc2").alias("dst")),
                F.struct(F.col("doc2").alias("src"), F.col("doc1").alias("dst")),
                F.struct(F.col("doc1").alias("src"), F.col("doc1").alias("dst")),
                F.struct(F.col("doc2").alias("src"), F.col("doc2").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    l1 = edges.groupBy(F.col("src").alias("doc_id")).agg(F.min("dst").alias("lbl"))
    l2 = (
        edges.join(l1.select(F.col("doc_id").alias("dst"), "lbl"), "dst")
        .groupBy(F.col("src").alias("doc_id"))
        .agg(F.min("lbl").alias("lbl"))
    )
    return l2.select(
        "doc_id",
        F.col("lbl").cast("long").alias("canonical_id"),
        (F.col("doc_id") != F.col("lbl")).alias("is_duplicate"),
    )


def variant_b(spark, sf_dir):
    return _resolve(_verified(spark, sf_dir))


def variant_c(spark, sf_dir):
    return _resolve(_verified(spark, sf_dir).localCheckpoint(eager=False))


def stats(df):
    p = df._jdf.queryExecution().executedPlan().toString()
    return f"scans={p.count('FileScan')} exch={p.count('Exchange') - p.count('BroadcastExchange')} reused={p.count('ReusedExchange')}"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("neardup-ab")
    spark.sparkContext.setLogLevel("ERROR")
    _small = "/testdata/" in sf_dir
    spark.conf.set("spark.sql.shuffle.partitions", "8" if _small else os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.adaptive.enabled", "false" if _small else "true")

    cur = QUERIES["docs_neardup_resolved"](spark, sf_dir)
    vb = variant_b(spark, sf_dir)
    if "--plans" in sys.argv:
        print("A (shipped):", stats(cur))
        print("B (explode):", stats(vb))
    for name, v in (("B", vb), ("C", variant_c(spark, sf_dir))):
        da, db = v.exceptAll(cur).count(), cur.exceptAll(v).count()
        print(f"exceptAll {name}", da, db)
        assert da == 0 and db == 0
        assert v.schema == cur.schema, (name, v.schema, cur.schema)

    run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())  # noqa: E731
    # C rebuilds per rep: a checkpointed frame caches its RDD, and timing
    # a second pass over the same object would be result caching
    run_c = lambda: variant_c(spark, sf_dir).write.format("noop").mode("overwrite").save()  # noqa: E731
    interleaved_ab("A union4   ", run(cur), "B explode  ", run(vb), reps=reps)
    interleaved_ab("B explode  ", run(vb), "C +ckpt    ", run_c, reps=reps)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
