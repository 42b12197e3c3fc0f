"""Partitioned table storage: the engine's at-rest layout.

SURVEY.md §4: sane partition keys are (station, part) for state and
(planned_date, shift_id) for storage. This module writes/reads the
production-record and history tables hive-partitioned on
(plan_date, shift_id) so that the dominant access patterns — "this
shift", "this day", limpieza's (date, shift) predicate (F6), shift
reports — prune partitions at the source instead of scanning history.

At 100 TB the same layout maps to object-store prefixes; writers add
``maxRecordsPerFile`` to bound file sizes and readers get partition
pruning + parquet min/max skipping for free. Verified by
tests/test_sources_skew.py::TestPartitionedStorage (the read plan must
show PartitionFilters, not a post-scan Filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PARTITION_KEYS = ("plan_date", "shift_id")


def write_partitioned(
    df: DataFrame,
    path: str,
    *,
    partition_keys: tuple[str, ...] = PARTITION_KEYS,
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write hive-partitioned parquet. ``maxRecordsPerFile`` bounds
    individual files so a hot (date, shift) partition splits instead of
    producing one giant file."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_keys)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; predicates on the partition keys
    become PartitionFilters (whole directories skipped, no I/O)."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 16,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sort-within-bucket) catalog
    table. Two tables bucketed the same way join WITHOUT any exchange —
    the co-located join that makes repeated fact⋈fact joins (history ⋈
    records on (station, part), lineitem ⋈ orders on orderkey) free
    after one write. At 100 TB this is the difference between
    re-shuffling the fact table per query and never shuffling it."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table written by ``write_bucketed`` (bucket
    metadata comes from the catalog, enabling exchange-free joins)."""
    return spark.table(table)
