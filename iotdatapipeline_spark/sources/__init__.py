"""Table and stream readers over the parquet fixtures."""

from iotdatapipeline_spark.sources.tables import TABLES, load_table

__all__ = ["TABLES", "load_table"]
