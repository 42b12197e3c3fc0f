"""SparkSession factory with scale-oriented defaults.

Tuned for correctness tests on local[N] but with settings chosen to
survive a 1000-executor / 100 TB deployment: AQE on (runtime shuffle
coalescing + skew-join splitting), broadcast threshold left at default
so tiny dims broadcast, Arrow enabled for the few pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "iotdatapipeline-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count: at test
    scale we want no straggler micro-partitions; at cluster scale AQE's
    ``coalescePartitions`` makes the initial number non-critical.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # catalog tables (bucketed writes) land in a scratch warehouse;
        # static conf, so it must be set at session build time
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/iotdp_warehouse"),
        )
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # fixture events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos timestamp — read as long, sources.tables converts
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
