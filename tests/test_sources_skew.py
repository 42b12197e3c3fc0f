"""CSV side-channel store (S4/K4) and skew-salting operator tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from iotdatapipeline_spark.operators.skew import salted_agg, salted_broadcast_left
from iotdatapipeline_spark.sources.csv_store import (
    PARTS_NOT_FOUND_SCHEMA,
    append_unknown_parts,
    read_csv_store,
)


def _rows(spark, rows):
    return spark.createDataFrame(rows, PARTS_NOT_FOUND_SCHEMA)


class TestCsvStore:
    def test_missing_file_reads_empty(self, spark, tmp_path):
        df = read_csv_store(spark, str(tmp_path / "nope.csv"))
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["estacion", "numero_parte", "fecha", "registrado"]

    def test_append_dedups_by_station_part_date(self, spark, tmp_path):
        path = str(tmp_path / "parts_not_found.csv")
        d = dt.date(2024, 1, 2)
        t = dt.datetime(2024, 1, 2, 9, 0, 0)
        n1 = append_unknown_parts(spark, path, _rows(spark, [("ST1", "P-9", d, t), ("ST2", "P-9", d, t)]))
        assert n1 == 2
        # duplicate key (same estacion/parte/fecha, later ts) must NOT append
        n2 = append_unknown_parts(spark, path, _rows(spark, [("ST1", "P-9", d, t.replace(hour=12))]))
        assert n2 == 0
        # same part next day DOES append (day-scoped dedup, Prensas.py:252-257)
        n3 = append_unknown_parts(
            spark, path, _rows(spark, [("ST1", "P-9", dt.date(2024, 1, 3), t)])
        )
        assert n3 == 1
        final = read_csv_store(spark, path)
        assert final.count() == 3
        # round-trip preserves schema and values
        got = {(r.estacion, str(r.fecha)) for r in final.collect()}
        assert got == {("ST1", "2024-01-02"), ("ST2", "2024-01-02"), ("ST1", "2024-01-03")}

    def test_append_is_idempotent(self, spark, tmp_path):
        path = str(tmp_path / "p.csv")
        d = dt.date(2024, 5, 5)
        t = dt.datetime(2024, 5, 5, 8)
        batch = _rows(spark, [("S", "X", d, t)])
        assert append_unknown_parts(spark, path, batch) == 1
        assert append_unknown_parts(spark, path, batch) == 0
        assert read_csv_store(spark, path).count() == 1


class TestPartitionedStorage:
    def test_write_read_partition_pruning(self, spark, sf_small, tmp_path):
        from iotdatapipeline_spark.plans import QUERIES
        from iotdatapipeline_spark.sources.storage import read_partitioned, write_partitioned

        rollup = QUERIES["production_shift_rollup"](spark, sf_small)
        path = str(tmp_path / "records_store")
        write_partitioned(rollup, path)

        back = read_partitioned(spark, path)
        # values survive the round trip (partition cols move position)
        assert back.count() == rollup.count()
        assert set(back.columns) == set(rollup.columns)

        one_day = back.filter(
            (F.col("plan_date") == back.agg(F.max("plan_date")).first()[0])
            & (F.col("shift_id") == 2)
        )
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        # the (date, shift) predicate must prune partitions at the
        # source: PartitionFilters populated, no post-scan Filter on
        # the partition keys
        pf = plan.split("PartitionFilters:")[1].splitlines()[0]
        assert "plan_date" in pf and "shift_id" in pf, plan
        assert one_day.count() > 0


class TestBucketedJoin:
    def test_colocated_join_has_no_exchange(self, spark, sf_small, tmp_path):
        from iotdatapipeline_spark.sources import load_table
        from iotdatapipeline_spark.sources.storage import read_table, write_bucketed

        li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
        o = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
        write_bucketed(li, "li_b", bucket_cols=("l_orderkey",), n_buckets=8, sort_cols=("l_orderkey",))
        write_bucketed(o, "o_b", bucket_cols=("o_orderkey",), n_buckets=8, sort_cols=("o_orderkey",))

        a, b = read_table(spark, "li_b"), read_table(spark, "o_b")
        # broadcast would hide the point at this size — force SMJ path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, a["l_orderkey"] == b["o_orderkey"]).groupBy().count()
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located: the join itself needs NO exchange (only the
            # final single-row aggregate may exchange)
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
            assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
            n = joined.first()[0]
            assert n == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
            spark.sql("DROP TABLE IF EXISTS li_b")
            spark.sql("DROP TABLE IF EXISTS o_b")


class TestSaltedAgg:
    def test_matches_plain_aggregation(self, spark, sf_small):
        from iotdatapipeline_spark.sources import load_table

        ev = load_table(spark, sf_small, "events").select(
            F.col("event_type").alias("part"),
            F.floor(F.col("value") * 100).cast("long").alias("counter"),
        )
        salted = salted_agg(
            ev, ["part"], {"total": ("sum", "counter"), "n": ("count", "counter"),
                           "hi": ("max", "counter"), "lo": ("min", "counter")}, n_salts=8
        )
        plain = ev.groupBy("part").agg(
            F.sum("counter").alias("total"),
            F.count("counter").alias("n"),
            F.max("counter").alias("hi"),
            F.min("counter").alias("lo"),
        )
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0

    def test_rejects_non_algebraic(self, spark):
        df = spark.range(5)
        try:
            salted_agg(df, ["id"], {"bad": ("collect_list", "id")})
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "algebraic" in str(e)

    def test_salt_spreads_hot_key(self, spark):
        # one key with 10k rows: the salted first phase must produce
        # multiple partial rows for it (i.e. the hot key really spreads)
        hot = spark.range(10_000).select(F.lit("HOT").alias("k"), F.col("id").alias("v"))
        salt = (F.rand(seed=42) * 8).cast("int").alias("__salt")
        n_partials = hot.withColumn("__salt", salt).groupBy("k", "__salt").count().count()
        assert n_partials == 8
        out = salted_agg(hot, ["k"], {"s": ("sum", "v")}, n_salts=8).first()
        assert out.s == sum(range(10_000))


class TestSaltedBroadcast:
    def test_broadcast_no_shuffle_of_big_side(self, spark, sf_small):
        from iotdatapipeline_spark.sources import load_table

        li = load_table(spark, sf_small, "lineitem").select("l_partkey", "l_quantity")
        p = load_table(spark, sf_small, "part").select(
            F.col("p_partkey").alias("l_partkey"), "p_name"
        )
        joined = salted_broadcast_left(li, p, ["l_partkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert plan.count("Exchange hashpartitioning") == 0, plan
        assert joined.count() == li.count()


class TestAqeSkewJoin:
    def test_aqe_splits_skewed_join_partition(self, spark):
        """The session's AQE config must actually SPLIT a skewed join
        partition at runtime (the cluster-scale defense the README's
        scale-design section claims): one key holding ~83% of the left
        side forces a hot reducer; with skew-join thresholds scaled to
        local data sizes, the executed adaptive plan must show the
        skewed AQEShuffleRead. Conf changes are restored afterwards."""
        saved = {
            k: spark.conf.get(k, None)
            for k in (
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            )
        }
        try:
            spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            big = spark.range(300_000).select(
                F.when(F.col("id") < 250_000, F.lit(0)).otherwise(F.col("id") % 997).alias("k"),
                F.col("id").alias("v"),
            )
            small = spark.range(997).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
            j = big.join(small, "k")
            assert len(j.collect()) == 300_000
            # plan must come from THIS frame's execution — AQE decisions
            # are per-query, a separate .count() plans independently
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "skew=true" in plan, plan
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
