"""Unit tests for the pure Column functions (C1-C5, C9) against the
execution-verified vectors recorded in SURVEY.md §2.9 / FIXTURES.md §C."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from iotdatapipeline_spark.functions import (
    cycle_time_seconds,
    decode_block,
    expand_alternatives,
    expand_block,
    plan_date,
    shift_id,
)


def _one(spark, col, **data):
    row = spark.createDataFrame([Row(**data)]).select(col.alias("out")).first()
    return row["out"]


class TestDecodeBlock:
    def test_low_byte_first(self, spark):
        # 0x4241 -> 'A' (low) then 'B' (high)
        assert _one(spark, decode_block(F.col("b")), b=[0x4241]) == "AB"

    def test_concat_and_nul_strip(self, spark):
        # "AB" + "C\x00" -> "ABC"
        assert _one(spark, decode_block(F.col("b")), b=[0x4241, 0x0043]) == "ABC"

    def test_null_block(self, spark):
        df = spark.createDataFrame([(None,)], "b array<int>")
        assert df.select(decode_block(F.col("b")).alias("o")).first()["o"] is None

    def test_all_nuls(self, spark):
        assert _one(spark, decode_block(F.col("b")), b=[0, 0]) == ""


class TestExpandAlternatives:
    def test_cartesian(self, spark):
        # SURVEY.md §2.9 C2: "12/34 X/Y" -> [12X, 12Y, 34X, 34Y]
        assert _one(spark, expand_alternatives(F.col("s")), s="12/34 X/Y") == [
            "12X",
            "12Y",
            "34X",
            "34Y",
        ]

    def test_no_slash_strips_spaces(self, spark):
        assert _one(spark, expand_alternatives(F.col("s")), s="AB 12 ") == ["AB12"]

    def test_nul_stripped_before_test(self, spark):
        assert _one(spark, expand_alternatives(F.col("s")), s="A\x00B") == ["AB"]

    def test_single_token_alternatives(self, spark):
        assert _one(spark, expand_alternatives(F.col("s")), s="A/B") == ["A", "B"]

    def test_three_tokens(self, spark):
        # product order: later tokens vary fastest
        out = _one(spark, expand_alternatives(F.col("s")), s="a/b c d/e")
        assert out == ["acd", "ace", "bcd", "bce"]

    def test_empty_string(self, spark):
        assert _one(spark, expand_alternatives(F.col("s")), s="") == [""]

    def test_plan_level_dispatch_equivalent(self, spark):
        # exploded_alternatives(df, col) must be row-for-row equal to
        # explode(expand_alternatives(col)) — including the general
        # (space-bearing) branch, NULs, NULLs, and empty strings
        from iotdatapipeline_spark.functions import exploded_alternatives

        vals = ["12/34 X/Y", "AB 12 ", "A\x00B", "A/B", "a/b c d/e", "", None, "plain", "x/ /y"]
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id int, s string")
        via_expr = df.withColumn("part", F.explode(expand_alternatives(F.col("s")))).select("id", "part")
        via_plan = exploded_alternatives(df, F.col("s")).select("id", "part")
        assert via_plan.exceptAll(via_expr).count() == 0
        assert via_expr.exceptAll(via_plan).count() == 0
        assert via_plan.count() == via_expr.count() > 0


class TestExpandBlock:
    def test_basic(self, spark):
        out = _one(spark, expand_block(F.col("a"), F.col("n")), a="D3100", n=3)
        assert out == ["D3100", "D3101", "D3102"]

    def test_length_one(self, spark):
        assert _one(spark, expand_block(F.col("a"), F.col("n")), a="M7", n=1) == ["M7"]

    def test_zero_length(self, spark):
        assert _one(spark, expand_block(F.col("a"), F.col("n")), a="D10", n=0) == []


class TestShiftDerivation:
    # FIXTURES.md §C 6-case table
    CASES = [
        (dt.datetime(2024, 5, 10, 7, 30), 2, dt.date(2024, 5, 9)),
        (dt.datetime(2024, 5, 10, 8, 0), 1, dt.date(2024, 5, 10)),
        (dt.datetime(2024, 5, 10, 15, 59), 1, dt.date(2024, 5, 10)),
        (dt.datetime(2024, 5, 10, 16, 0), 2, dt.date(2024, 5, 10)),
        (dt.datetime(2024, 5, 10, 23, 30), 2, dt.date(2024, 5, 10)),
        (dt.datetime(2024, 5, 10, 0, 30), 2, dt.date(2024, 5, 9)),
    ]

    def test_six_cases(self, spark):
        df = spark.createDataFrame([(ts,) for ts, _, _ in self.CASES], "ts timestamp")
        rows = df.select(
            F.col("ts"), shift_id(F.col("ts")).alias("s"), plan_date(F.col("ts")).alias("d")
        ).collect()
        got = {r["ts"]: (r["s"], r["d"]) for r in rows}
        for ts, s, d in self.CASES:
            assert got[ts] == (s, d), ts


class TestCycleTime:
    def test_ms_to_s(self, spark):
        assert _one(spark, cycle_time_seconds(F.col("v")), v=1500) == 1.5

    def test_abs(self, spark):
        assert _one(spark, cycle_time_seconds(F.col("v")), v=-2000) == 2.0

    def test_malformed_to_zero(self, spark):
        df = spark.createDataFrame([("abc",)], "v string")
        assert df.select(cycle_time_seconds(F.col("v")).alias("o")).first()["o"] == 0.0
