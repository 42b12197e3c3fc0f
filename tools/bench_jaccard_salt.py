"""Hot-shingle skew demonstration for the r14 jaccard_pairs salt
guard: a synthetic corpus where ONE stop-shingle is shared by every
doc, so the plain shape expands C(k,2) pairs of that bucket in a
single task while the salted shape spreads the same pairs across
salt-block rows. On local[32] the single-task tail shows up directly
in the ABBA wall medians. Also asserts exceptAll row identity.

Usage: python tools/bench_jaccard_salt.py [k_docs] [--reps N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import random

from pyspark.sql import functions as F

from iotdatapipeline_spark import get_spark
from iotdatapipeline_spark.analytics.dedup import jaccard_pairs, shingle_set
from tools.bench_q3_shootout import interleaved_ab


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 3000
    reps = 4
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("jaccard-salt-skew")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(4000)]
    rows = [
        (i, "the stop stop " + " ".join(rng.choices(vocab, k=12))) for i in range(k)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string").repartition(32)
    sh = shingle_set(docs, "doc_id", "text", n=3, distinct=True).localCheckpoint()

    plain = jaccard_pairs(sh, "doc_id", min_jaccard_x1000=0)
    salted = jaccard_pairs(sh, "doc_id", min_jaccard_x1000=0, salt_buckets=16)

    da, db = salted.exceptAll(plain).count(), plain.exceptAll(salted).count()
    print("exceptAll", da, db)
    assert da == 0 and db == 0

    def run_plain():
        plain.write.format("noop").mode("overwrite").save()

    def run_salted():
        salted.write.format("noop").mode("overwrite").save()

    interleaved_ab("plain ", run_plain, "salted", run_salted, reps=reps)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
