"""Driver-contract tests: exercise __spark_entry__ exactly the way the
round driver does (entry smoke at sf0.001; queries()/oracle_sql()
pairs compared column-sorted and value-canonicalized at sf0.001 for a
representative subset — the full sf0.01 sweep lives in
tools/parity_check.py)."""

from __future__ import annotations

import datetime as _dt
import math
import subprocess
import sys

import duckdb
import pytest

import __spark_entry__ as entry_mod

REPRESENTATIVE = [
    "production_shift_rollup",   # window + agg + broadcast join
    "q1_pricing_summary",        # scan-heavy agg
    "docs_exact_dedup",          # hash groupBy
    "embeddings_kmeans",         # iterative
    "multimodal_image_features", # mapInPandas
    "topk_orders",               # TakeOrderedAndProject
]


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)


def _key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


class TestDriverContract:
    def test_entry_smoke(self, spark):
        df = entry_mod.entry(spark)
        assert df.count() > 0
        assert df.schema.fieldNames() == [
            "station", "part", "plan_date", "shift_id", "emit_count", "last_counter", "qty",
        ]

    def test_queries_and_oracles_cover_each_other(self):
        q, o = entry_mod.queries(), entry_mod.oracle_sql()
        assert set(o) <= set(q)
        assert len(q) >= 49

    @pytest.mark.slow
    def test_representative_queries_hash_match_duckdb(self, spark, sf_small):
        q, o = entry_mod.queries(), entry_mod.oracle_sql()
        con = duckdb.connect()
        for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")
        for name in REPRESENTATIVE:
            sdf = q[name](spark, sf_small)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
            ddf = con.sql(o[name])
            dcols, drows = list(ddf.columns), ddf.fetchall()
            assert sorted(scols) == sorted(dcols), name
            assert _key(scols, srows) == _key(dcols, drows), name


class TestCli:
    @pytest.mark.slow
    def test_query_subcommand_runs(self):
        out = subprocess.run(
            [sys.executable, "-m", "iotdatapipeline_spark", "query", "shift_derivation",
             "--sf-dir", "/root/testdata/sf0.001", "--rows", "2"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "shift_id" in out.stdout

    def test_query_subcommand_unknown_name(self):
        out = subprocess.run(
            [sys.executable, "-m", "iotdatapipeline_spark", "query", "no_such_query"],
            capture_output=True, text=True, timeout=120, cwd="/root/repo",
        )
        assert out.returncode == 2
        assert "unknown query" in out.stderr
