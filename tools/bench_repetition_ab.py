"""A/B + decomposition harness for docs_repetition_stats (r13).

Times, with the bench profile (p=8, AQE off, noop sink, warm plans,
median-of-N interleaved ABBA):

  full        the registered query as-is
  words_only  doc_id + word-level stats only (no n-grams)
  grams_only  doc_id + n-gram dup ratios only (no top_freq/sort)
  topfreq     doc_id + top_word only (array_sort + fold)
  zipgrams    full query with n-gram distinct counts computed over
              STRUCT PAIRS (arrays_zip of shifted slices) instead of
              string grams built by transform(sequence)+slice+join

Usage: python tools/bench_repetition_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iotdatapipeline_spark import get_spark  # noqa: E402
from iotdatapipeline_spark.plans import QUERIES  # noqa: E402
from iotdatapipeline_spark.plans.analytics import words  # noqa: E402
from iotdatapipeline_spark.sources import load_table  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(df, reps):
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        noop(df)
        samples.append(time.perf_counter() - t0)
    return samples


def build_variants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    d0 = docs.withColumn("__ws", words(F.col("text")))
    ws = F.col("__ws")
    nw = F.array_size(ws)

    def ngrams(n):
        cnt = F.greatest(nw - F.lit(n - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), cnt), lambda i: F.array_join(F.slice(ws, i, n), " ")
        )

    def dup_ratio(arr):
        return F.floor(
            1000.0 * (F.array_size(arr) - F.array_size(F.array_distinct(arr))) / F.array_size(arr)
        ).cast("long")

    sorted_ws = F.array_sort(ws)
    top_freq = F.aggregate(
        sorted_ws,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )

    nd_col = F.array_size(F.array_distinct(ws))

    words_only = d0.withColumn("__nd", nd_col).select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        F.col("__nd").cast("long").alias("n_distinct_words"),
        F.floor(1000.0 * (nw - F.col("__nd")) / nw).cast("long").alias("dup_word_x1000"),
    )
    grams_only = (
        d0.withColumn("__g2", ngrams(2))
        .withColumn("__g3", ngrams(3))
        .select(
            "doc_id",
            dup_ratio(F.col("__g2")).alias("dup_2gram_x1000"),
            dup_ratio(F.col("__g3")).alias("dup_3gram_x1000"),
        )
    )
    topfreq_only = d0.select(
        "doc_id", F.floor(1000.0 * top_freq / nw).cast("long").alias("top_word_x1000")
    )

    # zip-struct n-gram dup counts: distinct count of (w_i, w_{i+1}[,w_{i+2}])
    # struct pairs equals distinct count of the joined gram strings (words
    # cannot contain the join character). Sizes: n-1 (resp. n-2) pairs; the
    # degenerate short-doc cases are special-cased to 0 exactly as the gram
    # form floors them.
    p2 = F.arrays_zip(F.slice(ws, 1, nw - 1), F.slice(ws, 2, nw - 1))
    p3 = F.arrays_zip(
        F.slice(ws, 1, nw - 2), F.slice(ws, 2, nw - 2), F.slice(ws, 3, nw - 2)
    )

    def dup_pairs(pairs, cnt, degenerate):
        sz = F.array_size(pairs)
        return F.when(degenerate, F.lit(0)).otherwise(
            F.floor(1000.0 * (sz - F.array_size(F.array_distinct(pairs))) / sz)
        ).cast("long")

    d1 = d0.withColumn("__nd", nd_col)
    zipgrams = d1.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        F.col("__nd").cast("long").alias("n_distinct_words"),
        F.floor(1000.0 * (nw - F.col("__nd")) / nw).cast("long").alias("dup_word_x1000"),
        F.floor(1000.0 * top_freq / nw).cast("long").alias("top_word_x1000"),
        dup_pairs(p2, nw - 1, nw <= 1).alias("dup_2gram_x1000"),
        dup_pairs(p3, nw - 2, nw <= 2).alias("dup_3gram_x1000"),
    )

    return {
        "full": QUERIES["docs_repetition_stats"](spark, sf_dir),
        "words_only": words_only,
        "grams_only": grams_only,
        "topfreq": topfreq_only,
        "zipgrams": zipgrams,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark("repetition-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    variants = build_variants(spark, sf_dir)

    # equivalence first: zipgrams must equal full row-for-row
    full, zg = variants["full"], variants["zipgrams"]
    a, b = full.exceptAll(zg).count(), zg.exceptAll(full).count()
    print(f"equiv full-vs-zipgrams: {a} / {b} (must be 0/0); schema_match={full.schema == zg.schema}")

    for df in variants.values():  # warm all plans
        noop(df)
        noop(df)
    # interleaved rounds: one rep of each variant per round
    samples = {k: [] for k in variants}
    for _ in range(reps):
        for k, df in variants.items():
            t0 = time.perf_counter()
            noop(df)
            samples[k].append(time.perf_counter() - t0)
    for k, ss in samples.items():
        print(f"{k:11s} median={statistics.median(ss):.3f} min={min(ss):.3f} all={[round(s,3) for s in ss]}")
    spark.stop()


if __name__ == "__main__":
    main()
