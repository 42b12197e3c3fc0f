"""The plcsim custom Spark source (sources/plc_source.py): batch
partition planning, streaming offset protocol, and checkpoint-restart
exactly-once — the source-protocol properties a real PLC connector
deployment depends on (the reference's pymcprotocol poll loop,
Prensas.py:506-509, 602-604, re-hosted as a pluggable source)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from iotdatapipeline_spark.sources.plc_source import (
    oracle_sql,
    register_plcsim,
    word_at,
)


@pytest.fixture()
def plc(spark):
    register_plcsim(spark)
    return spark


class TestBatchScan:
    def test_partitions_are_station_ranges(self, plc):
        df = (
            plc.read.format("plcsim")
            .option("stations", 20)
            .option("ticks", 3)
            .option("registers", 2)
            .option("partition_stations", 5)
            .load()
        )
        assert df.rdd.getNumPartitions() == 4
        assert df.count() == 20 * 3 * 2

    def test_words_match_reference_hash(self, plc):
        df = (
            plc.read.format("plcsim")
            .option("stations", 3)
            .option("ticks", 2)
            .option("registers", 2)
            .load()
        )
        got = {(r["station"], r["tick"], r["address"]): r["word"] for r in df.collect()}
        for (s, t, a), w in got.items():
            assert w == word_at(s, t, a)
        assert len(got) == 12

    def test_oracle_sql_regenerates_source(self, plc):
        import duckdb

        df = (
            plc.read.format("plcsim")
            .option("stations", 5)
            .option("ticks", 4)
            .option("registers", 3)
            .load()
        )
        spark_rows = sorted(tuple(r) for r in df.collect())
        duck_rows = sorted(duckdb.sql(oracle_sql(5, 4, 3)).fetchall())
        assert spark_rows == duck_rows


class TestStreamProtocol:
    def _drain(self, spark, q, sink, expected, timeout=120):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if spark.table(sink).count() >= expected:
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination()

    def test_each_tick_delivered_exactly_once(self, plc, tmp_path):
        stations, ticks, registers = 6, 5, 3
        sink = "plc_proto_sink"
        stream = (
            plc.readStream.format("plcsim")
            .option("stations", stations)
            .option("ticks", ticks)
            .option("registers", registers)
            .option("ticks_per_batch", 2)
            .load()
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        self._drain(plc, q, sink, stations * ticks * registers)
        per_tick = {
            r["tick"]: r["n"]
            for r in plc.table(sink).groupBy("tick").agg(F.count("*").alias("n")).collect()
        }
        assert per_tick == {t: stations * registers for t in range(ticks)}

    def test_checkpoint_restart_no_dup_no_loss(self, plc, tmp_path):
        """Stop the stream mid-run and restart on the same checkpoint:
        the freshly constructed reader's tick counter restarts at 0,
        but batches are driven by the CHECKPOINTED [start, end) offsets
        — after catch-up triggers, every (station, tick, address) cell
        lands exactly once in the file sink."""
        stations, ticks, registers = 4, 6, 2
        expected = stations * ticks * registers
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def start():
            return (
                plc.readStream.format("plcsim")
                .option("stations", stations)
                .option("ticks", ticks)
                .option("registers", registers)
                .option("ticks_per_batch", 1)
                .load()
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="50 milliseconds")
                .start()
            )

        q = start()
        deadline = time.time() + 60
        while time.time() < deadline:
            # wait for at least one COMMITTED batch with data (progress
            # events fire after the sink commit, so the metadata log is
            # readable once we see one)
            if any(p["numInputRows"] > 0 for p in q.recentProgress):
                break
            time.sleep(0.1)
        q.stop()
        q.awaitTermination()
        first = plc.read.parquet(out).count()
        assert 0 < first < expected  # genuinely interrupted mid-stream

        q = start()
        deadline = time.time() + 120
        while time.time() < deadline:
            if plc.read.parquet(out).count() >= expected:
                break
            time.sleep(0.2)
        q.stop()
        q.awaitTermination()
        got = plc.read.parquet(out)
        assert got.count() == expected  # no loss
        assert got.distinct().count() == expected  # no duplicates
        cells = {(r["station"], r["tick"], r["address"]) for r in got.collect()}
        assert len(cells) == expected  # every cell exactly once
