"""Parquet table readers (S2/S4-style scans over the fixture star schema).

At cluster scale these become ``spark.read.parquet`` over partitioned
object-store paths (or JDBC for the reference's SQL Server dims,
SURVEY.md §2.1 S2/S3); locally they read the driver fixtures. Reads are
declarative so Catalyst pushes filters and prunes columns into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. ``name`` must be a known table.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet; Spark reads it (via
    ``spark.sql.legacy.parquet.nanosAsLong``) as a long of epoch-nanos.
    We convert to a proper timestamp by exact integer division to
    microseconds (``div`` stays in long — a double divide would lose
    sub-µs precision at 1.7e18 ns), matching DuckDB's ns→µs truncation.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # parquet rewritten by another engine (e.g. the crossover
            # tiler) may carry isAdjustedToUTC=false; the session runs
            # in UTC so this cast is value-preserving
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk size of one fixture table (file or partitioned dir).

    Used for CBO-style physical decisions (e.g. "is this side small
    enough to broadcast-hint?") where Spark's own statistics are not
    yet in scope because the decision happens at plan-construction
    time. Returns 0 when the path is missing so callers degrade to the
    conservative (no-hint) branch.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        return os.path.getsize(path)
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        )
    return 0


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
