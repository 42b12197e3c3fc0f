"""DSIR shape shoot-out at x10 (verdict r7 item 4).

Candidates:
  A (r7 shipped): two exchanges hang off the raw gram stream — the
    256-bucket distribution aggregate AND the score-join + doc_id
    aggregate each re-explode and re-md5 the corpus.
  B (r8): pre-aggregate (doc_id, lang, f) -> count once; both
    consumers shuffle that identical subtree so ReuseExchange runs
    explode+md5 ONCE, and the per-doc shuffle payload is bounded at
    256 rows/doc.

Protocol: interleaved ABBA within one warm session, median of 6,
results asserted equal first (same reasoning as bench_q3_shootout).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import ensure_crossover_dir
from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.plans import QUERIES
from iotdatapipeline_spark.sources import load_table

TILES = int(os.environ.get("TILES", "10"))


def dsir_r7_two_pass(spark, sf_dir):
    """The round-7 shape, kept verbatim as the A side."""
    from iotdatapipeline_spark.analytics.text import shingles_of_words, words

    docs = load_table(spark, sf_dir, "documents").withColumn("__ws", words(F.col("text")))
    bucket = (
        F.conv(F.substring(F.md5(F.col("g").cast("binary")), 1, 8), 16, 10).cast("long") % 256
    )
    grams = docs.select(
        "doc_id", "lang", F.explode(shingles_of_words(F.col("__ws"), 2)).alias("g")
    ).select("doc_id", "lang", bucket.alias("f"))
    dist = grams.groupBy("f").agg(
        F.count(F.lit(1)).alias("rc"),
        F.count_if(F.col("lang") == "en").alias("tc"),
    )
    scores = dist.select("f", F.expr("(1000 * (tc + 1)) div (rc + 1)").alias("s"))
    return (
        grams.join(F.broadcast(scores), "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("s").cast("long").alias("dsir_weight"),
        )
    )


def main() -> int:
    from tools.bench_q3_shootout import interleaved_ab

    xdir = ensure_crossover_dir("/root/testdata/sf0.1", tiles=TILES)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scratch-dsir-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", cpus)

    shipped = QUERIES["docs_dsir_weights"]
    a = sorted(tuple(r) for r in dsir_r7_two_pass(spark, xdir).collect())
    b = sorted(tuple(r) for r in shipped(spark, xdir).collect())
    assert a == b, "shapes disagree"
    print(f"results match ({len(a)} rows)")

    # action = sum over the OUTPUT columns: a bare count() lets the
    # optimizer prune the row-local scoring projection entirely and
    # measures nothing (it did, in the first draft of this tool)
    def run(q):
        return q.agg(F.sum("dsir_weight"), F.sum("n_grams")).collect()

    interleaved_ab(
        "r7 two-pass   ", lambda: run(dsir_r7_two_pass(spark, xdir)),
        "r8 row-local  ", lambda: run(shipped(spark, xdir)),
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
