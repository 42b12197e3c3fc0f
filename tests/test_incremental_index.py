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


class TestStreamJoinRecovery:
    def test_interval_join_resumes_from_checkpoint(self, spark, sf_small, tmp_path):
        """Stop/restart correctness for the stream-stream interval
        join: drain half the replay, terminate, deliver the rest
        against the SAME checkpoint. Buffered join state (clicks
        awaiting future purchases and vice versa) must survive the
        restart: the file-sink output across both runs equals the
        batch interval join exactly — no lost cross-restart matches,
        no duplicates."""
        import shutil

        from iotdatapipeline_spark.streaming.source import (
            readings_stream,
            stage_replay_chunks,
        )

        staged = stage_replay_chunks(spark, sf_small, str(tmp_path / "staged"), n_chunks=6)
        live = str(tmp_path / "replay")
        os.makedirs(live)
        chunks = sorted(os.listdir(staged))

        def deliver(name: str, order: int) -> None:
            dst = os.path.join(live, name)
            shutil.copy(os.path.join(staged, name), dst)
            os.utime(dst, (1_700_000_000 + order, 1_700_000_000 + order))

        def run_join() -> None:
            clicks = (
                readings_stream(spark, live, max_files_per_trigger=1)
                .withWatermark("ts", "7 hours")
                .filter(F.col("part") == "click")
                .select(
                    F.col("station").alias("c_station"),
                    F.col("ts").alias("c_ts"),
                    F.col("event_id").alias("click_id"),
                )
            )
            purchases = (
                readings_stream(spark, live, max_files_per_trigger=1)
                .withWatermark("ts", "7 hours")
                .filter(F.col("part") == "purchase")
                .select(
                    "station", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
                )
            )
            joined = purchases.join(
                clicks,
                (F.col("c_station") == F.col("station"))
                & (F.col("c_ts") <= F.col("p_ts"))
                & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 6 hours")),
                "inner",
            ).select("station", "purchase_id", "click_id")
            q = (
                joined.writeStream.outputMode("append")
                .format("parquet")
                .option("path", str(tmp_path / "out"))
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        for i, c in enumerate(chunks[:3]):
            deliver(c, i)
        run_join()
        mid = spark.read.parquet(str(tmp_path / "out")).count()
        for i, c in enumerate(chunks[3:]):
            deliver(c, 3 + i)
        run_join()

        got_df = spark.read.parquet(str(tmp_path / "out"))
        assert got_df.count() == got_df.distinct().count()  # exactly-once sink
        got = {(r.station, r.purchase_id, r.click_id) for r in got_df.collect()}

        ev = load_table(spark, sf_small, "events")
        p = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("station"), F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        c = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_station"), F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        expected_df = p.join(
            c,
            (F.col("c_station") == F.col("station"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 6 hours")),
        ).select("station", "purchase_id", "click_id")
        expected = {(r.station, r.purchase_id, r.click_id) for r in expected_df.collect()}

        assert got == expected
        assert len(got) > mid  # cross-restart matches actually happened


class TestBqVectorIndexMaintain:
    """BqVectorIndex: the stored sign-bit ANN tier maintained from the
    source's change feed — refresh == from-scratch repack, replays and
    no-change refreshes are metadata no-ops."""

    def test_refresh_equals_rebuild(self, spark, tmp_path):
        from iotdatapipeline_spark.analytics.similarity import binary_quantize
        from iotdatapipeline_spark.matview import BqVectorIndex
        from iotdatapipeline_spark.sources.versioned import VersionedTable

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        src = VersionedTable(spark, str(tmp_path / "src"))
        src.create(emb, cluster_by=["vec_id"])
        idx = BqVectorIndex.create(
            spark, str(tmp_path / "idx"), str(tmp_path / "src")
        )
        seed_files = len(
            idx.table()._read_manifest(idx.table().version())["files"]
        )
        upd = (
            src.snapshot()
            .filter(F.col("vec_id") % 7 == 0)
            .withColumn("embedding", F.transform("embedding", lambda x: -x))
        )
        src.merge_into(upd, ["vec_id"])
        src.delete_where("vec_id % 9 = 0")
        assert idx.refresh() == 3
        v = idx.table().version()
        assert idx.refresh() == 3 and idx.table().version() == v  # no-op
        got = idx.table().snapshot().select("vec_id", "bq")
        want = binary_quantize(src.snapshot())
        assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
        assert seed_files >= 1  # seeded as a real table, not a cache

    def test_fresh_handle_searches_stored_words(self, spark, tmp_path):
        from iotdatapipeline_spark.matview import BqVectorIndex
        from iotdatapipeline_spark.sources.versioned import VersionedTable

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        src = VersionedTable(spark, str(tmp_path / "src"))
        src.create(emb, cluster_by=["vec_id"])
        BqVectorIndex.create(spark, str(tmp_path / "idx"), str(tmp_path / "src"))
        # a NEW handle reads the sidecar spec and searches the stored words
        idx2 = BqVectorIndex(spark, str(tmp_path / "idx"))
        top = idx2.search(src.snapshot().filter("vec_id < 3"), k=2)
        rows = top.collect()
        assert {r["qid"] for r in rows} == {0, 1, 2}
        assert all(r["rk"] in (1, 2) for r in rows)
        assert all(r["nid"] != r["qid"] for r in rows)

    def test_expired_history_raises_and_reseed_recovers(self, spark, tmp_path):
        """r13 lifecycle pin: expire_versions() past the index's
        applied cursor raises the typed ViewHistoryExpired; reseed()
        repacks at the current version and re-anchors the cursor."""
        import pytest as _pytest

        from iotdatapipeline_spark.analytics.similarity import binary_quantize
        from iotdatapipeline_spark.matview import BqVectorIndex, ViewHistoryExpired
        from iotdatapipeline_spark.sources.versioned import VersionedTable

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        src = VersionedTable(spark, str(tmp_path / "src"))
        src.create(emb, cluster_by=["vec_id"])
        idx = BqVectorIndex.create(
            spark, str(tmp_path / "idx"), str(tmp_path / "src")
        )
        src.delete_where("vec_id % 9 = 0")
        src.merge_into(
            src.snapshot()
            .filter(F.col("vec_id") % 7 == 0)
            .withColumn("embedding", F.transform("embedding", lambda x: -x)),
            ["vec_id"],
        )
        src.expire_versions(keep_last=1)
        with _pytest.raises(ViewHistoryExpired, match="reseed"):
            idx.refresh()
        assert idx.reseed() == src.version()
        got = idx.table().snapshot().select("vec_id", "bq")
        want = binary_quantize(src.snapshot())
        assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
        # cursor re-anchored: incremental again
        src.delete_where("vec_id % 11 = 0")
        assert idx.refresh() == src.version()
        got = idx.table().snapshot().select("vec_id", "bq")
        want = binary_quantize(src.snapshot())
        assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
