"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Each query is forced to full execution via a count-style collect (no
result materialization on the driver beyond the aggregate). A warmup
query amortizes JVM/codegen startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iotdatapipeline_spark import get_spark  # noqa: E402
from iotdatapipeline_spark.plans import QUERIES  # noqa: E402

HEADLINE = [
    "production_shift_rollup",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "dedup_combine_parts",
    "top1_active_record",
    "events_sessionization",
    # analytics extensions (skipped automatically if not yet registered)
    "docs_minhash_lsh_pairs",
    "docs_exact_dedup",
    "embeddings_knn_bruteforce",
    "docs_token_stats",
]


#: Tiny-scale warmup dir: executing each headline plan once at sf0.001
#: populates the JVM codegen caches (generated code is keyed by plan
#: STRUCTURE, not data paths, so it carries across scale factors).
#: The timed region then measures steady-state throughput — the number
#: that matters for a long-running engine — instead of one-time
#: compilation (~40% of cold wall at this data size; see BASELINE.md).
WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("iotdatapipeline-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM start, parquet footers, and per-plan codegen compile
    # all land outside the timed region
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is not None and os.path.isdir(WARMUP_SF_DIR):
            fn(spark, WARMUP_SF_DIR).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = n
    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
