"""Streaming throughput bench: replay the events fixture through the
T4 stateful counter machine (applyInPandasWithState, reference
emit-mode) and report end-to-end rows/sec.

Context for the number (BASELINE.md): the reference is architecturally
capped at ONE reading per station per ≥1 s poll tick (Prensas.py:602-604,
single asyncio thread), i.e. ~#stations rows/sec at best. This bench
measures the same per-key state semantics at engine speed: N micro-
batches of a file-replay stream, state carried across batches, sink to
memory. Usage:

    python tools/bench_streaming.py [sf_dir] [n_chunks]

Prints one JSON line {"metric": "stream_counter_rows_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iotdatapipeline_spark import get_spark  # noqa: E402
from iotdatapipeline_spark.streaming import (  # noqa: E402
    counter_state_machine,
    readings_stream,
    stage_replay_chunks,
)
from iotdatapipeline_spark.streaming.stateful import zscore_alert_machine  # noqa: E402


def run_once(spark, replay_dir: str, ckpt_root: str, files_per_trigger: int, machine: str = "counter") -> dict:
    stream = readings_stream(spark, replay_dir, max_files_per_trigger=files_per_trigger)
    if machine == "zscore":
        out = zscore_alert_machine(stream)
    else:
        out = counter_state_machine(stream, emit_mode="reference")
    sink = f"bench_stream_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", os.path.join(ckpt_root, sink))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    n_out = spark.table(sink).count()
    n_batches = len(q.recentProgress)
    return {"wall_sec": round(wall, 3), "rows_out": n_out, "n_batches": n_batches}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("iotdatapipeline-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="iotdp_stream_bench_")
    try:
        replay = stage_replay_chunks(spark, sf_dir, os.path.join(work, "replay"), n_chunks=n_chunks)
        from iotdatapipeline_spark.sources import load_table

        n_in = load_table(spark, sf_dir, "events").count()

        # warm once (codegen + Python worker pool), then measure
        run_once(spark, replay, work, files_per_trigger=n_chunks)
        per_batch = run_once(spark, replay, work, files_per_trigger=1)
        one_shot = run_once(spark, replay, work, files_per_trigger=n_chunks)
        z_shot = run_once(spark, replay, work, files_per_trigger=n_chunks, machine="zscore")

        out = {
            "metric": "stream_counter_rows_per_sec",
            "sf_dir": sf_dir,
            "rows_in": n_in,
            "micro_batched": {
                **per_batch,
                "rows_per_sec": round(n_in / per_batch["wall_sec"]),
            },
            "single_batch": {
                **one_shot,
                "rows_per_sec": round(n_in / one_shot["wall_sec"]),
            },
            "zscore_single_batch": {
                **z_shot,
                "rows_per_sec": round(n_in / z_shot["wall_sec"]),
            },
            "reference_ceiling_rows_per_sec": "~n_stations (1 reading/station/s poll floor, Prensas.py:602-604)",
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
