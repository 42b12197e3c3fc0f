"""Table and stream readers over the parquet fixtures."""

from iotdatapipeline_spark.sources.csv_store import (
    append_unknown_parts,
    read_csv_store,
)
from iotdatapipeline_spark.sources.dbapi import (
    ConnectFactory,
    dbapi_upsert,
    dbapi_upsert_foreach_batch,
    read_jdbc,
    upsert_sql,
    write_jdbc_append,
)
from iotdatapipeline_spark.sources.tables import TABLES, load_table, register_views, table_bytes
from iotdatapipeline_spark.sources.versioned import CommitConflict, VersionedTable

__all__ = [
    "CommitConflict",
    "VersionedTable",
    "TABLES",
    "load_table",
    "register_views",
    "table_bytes",
    "read_csv_store",
    "append_unknown_parts",
    "read_jdbc",
    "write_jdbc_append",
    "upsert_sql",
    "ConnectFactory",
    "dbapi_upsert",
    "dbapi_upsert_foreach_batch",
]
