"""Interleaved ABBA for the r14 docs_minhash_lsh_pairs rework: the r13
bucket-expansion + cross-band ``distinct`` form (inlined below) vs the
shipped first-band-emission form (no pair dedup shuffle). Usage:

    python tools/bench_lsh_pairs_ab.py <sf_dir> [--reps N]
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


def old_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_set(docs, "doc_id", "text", n=3, distinct=False)
    sigs = minhash_signatures(sh, "doc_id", k=8)
    return lsh_candidate_pairs(sigs, "doc_id", k=8, rows_per_band=2)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    spark = get_spark("lsh-pairs-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))

    old = old_pairs(spark, sf_dir)
    new = QUERIES["docs_minhash_lsh_pairs"](spark, sf_dir)
    da, db = new.exceptAll(old).count(), old.exceptAll(new).count()
    print("exceptAll", da, db)
    assert da == 0 and db == 0

    def run_old():
        old.write.format("noop").mode("overwrite").save()

    def run_new():
        new.write.format("noop").mode("overwrite").save()

    interleaved_ab("old distinct  ", run_old, "new first-band", run_new, reps=reps)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
