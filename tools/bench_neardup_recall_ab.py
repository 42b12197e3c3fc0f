"""r14: embeddings_neardup_recall referenced the O(n²) truth pair set
twice per probe width (count + semi-join) and each blocked set twice —
28 exchanges / 32 scans analyzed. Variant: per probe, ONE full-outer
join of truth and blocked with presence flags and ONE aggregate yields
n_true / n_blocked / n_hit together (truth referenced once per probe;
the two probe-level truth subtrees are identical, so exchange reuse
shares the quadratic scorer). Usage:

    python tools/bench_neardup_recall_ab.py <sf_dir> [--reps N] [--plans]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.analytics import ivf_assign, neardup_pairs
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table
from tools.bench_q3_shootout import interleaved_ab


def one_join_variant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    truth = neardup_pairs(emb, min_cos_x1e6=350_000, allow_quadratic=True).select("id1", "id2")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding")
    )
    rows = []
    for n_probe in (1, 2):
        assigned = ivf_assign(emb, cents, n_probe=n_probe).select("vec_id", "centroid_id")
        blocked = (
            neardup_pairs(emb.join(assigned, "vec_id"), block_col="centroid_id", min_cos_x1e6=350_000)
            .select("id1", "id2")
            .distinct()
        )
        t = truth.withColumn("t", F.lit(1))
        b = blocked.withColumn("b", F.lit(1))
        j = t.join(b, ["id1", "id2"], "full_outer")
        rows.append(
            j.agg(
                F.count("t").alias("n_true"),
                F.count("b").alias("n_blocked"),
                F.count(F.when((F.col("t") == 1) & (F.col("b") == 1), 1)).alias("n_hit"),
            ).select(
                F.lit(n_probe).cast("int").alias("n_probe"),
                "n_true",
                "n_blocked",
                "n_hit",
                F.floor(100.0 * F.col("n_hit") / F.greatest(F.col("n_true"), F.lit(1)))
                .cast("long")
                .alias("recall_x100"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def stats(df):
    p = df._jdf.queryExecution().executedPlan().toString()
    return f"scans={p.count('FileScan')} exch={p.count('Exchange') - p.count('BroadcastExchange')} reused={p.count('ReusedExchange')}"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("ndr-ab")
    spark.sparkContext.setLogLevel("ERROR")
    _small = "/testdata/" in sf_dir
    spark.conf.set("spark.sql.shuffle.partitions", "8" if _small else os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set("spark.sql.adaptive.enabled", "false" if _small else "true")

    cur = QUERIES["embeddings_neardup_recall"](spark, sf_dir)
    v = one_join_variant(spark, sf_dir)
    if "--plans" in sys.argv:
        print("A (shipped):", stats(cur))
        print("B (one-join):", stats(v))
    da, db = v.exceptAll(cur).count(), cur.exceptAll(v).count()
    print("exceptAll", da, db)
    assert da == 0 and db == 0
    assert v.schema == cur.schema, (v.schema, cur.schema)

    run = lambda q: (lambda: q.write.format("noop").mode("overwrite").save())  # noqa: E731
    interleaved_ab("A 4-ref counts", run(cur), "B one-join    ", run(v), reps=reps)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
