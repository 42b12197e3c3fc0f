"""End-to-end incremental LSH index maintenance over a stream: each
micro-batch of new documents is probed against the index accumulated
from all PREVIOUS batches, then appended to it — the streaming form of
``docs_incremental_neardup``'s daily-ingest pattern. The union of
per-batch probe results must equal the batch-computed cross-chunk
candidate set (later chunk probes earlier chunk), proving the
foreachBatch index maintenance loses nothing and invents nothing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iotdatapipeline_spark.analytics.dedup import (
    lsh_band_long,
    lsh_probe_candidates,
    minhash_signatures,
    shingle_set,
)
from iotdatapipeline_spark.sources import load_table

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _bands(df):
    return lsh_band_long(
        minhash_signatures(shingle_set(df, "doc_id", "text", 3, distinct=False), "doc_id"),
        "doc_id",
    )


def test_streaming_incremental_lsh_index(spark, sf_oracle, tmp_path):
    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )

    # stage 3 arrival chunks (deterministic assignment, sequential
    # writes => increasing mtimes => replay order = chunk order)
    replay = str(tmp_path / "replay")
    os.makedirs(replay)
    for c in range(3):
        docs.filter(F.col("doc_id") % 3 == c).toPandas().to_parquet(
            os.path.join(replay, f"chunk_{c}.parquet"), index=False
        )

    index_dir = str(tmp_path / "index")
    got: set[tuple[int, int]] = set()

    def handle(batch_df, batch_id):
        bands = _bands(batch_df)
        if os.path.isdir(index_dir):
            cands = lsh_probe_candidates(
                batch_df.sparkSession.read.parquet(index_dir), bands, "doc_id"
            )
            got.update((r["probe_id"], r["index_id"]) for r in cands.collect())
        bands.write.mode("append").parquet(index_dir)

    q = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # batch truth: same band join, restricted to later-chunk probes
    # against earlier-chunk index entries
    all_bands = _bands(docs)
    probe = all_bands.select(F.col("doc_id").alias("probe_id"), "band_id", "band_hash")
    index = all_bands.select(F.col("doc_id").alias("index_id"), "band_id", "band_hash")
    expected_df = (
        probe.join(index, ["band_id", "band_hash"])
        .filter((F.col("probe_id") % 3) > (F.col("index_id") % 3))
        .select("probe_id", "index_id")
        .distinct()
    )
    expected = {(r["probe_id"], r["index_id"]) for r in expected_df.collect()}

    assert got == expected
    assert len(got) > 0
