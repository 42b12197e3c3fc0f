"""CSV side-channel store (S4/K4 — the reference's
``parts_not_found.csv``, Prensas.py:227-279).

The reference keeps a CSV of unknown part numbers, appending a row only
if (estacion, numero_parte, fecha) is not already present for that day
(pandas read → boolean-mask dup test → append, Prensas.py:249-262).
Here the same contract is a schema-explicit CSV read, a left-anti
dedup against the existing file, and an atomic rewrite — all
DataFrame-native so it composes with the rest of the engine and the
dedup logic is the shared ``dedup_append_set`` operator.

Scale note: a driver-local CSV is inherently a small side-channel
(it holds *unknown* keys, bounded by the part-number dimension, not by
event volume). The operators stay distributed; only the final write
coalesces. If the reject stream ever grows beyond that, the same
functions target a parquet/Delta path unchanged.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from iotdatapipeline_spark.operators.relational import dedup_append_set

PARTS_NOT_FOUND_SCHEMA = "estacion string, numero_parte string, fecha date, registrado timestamp"


def read_csv_store(spark: SparkSession, path: str, schema=PARTS_NOT_FOUND_SCHEMA) -> DataFrame:
    """Schema-explicit CSV read (header, no inference — inference is a
    full extra pass and nondeterministic on empty/partial files).
    ``schema`` is a DDL string or StructType."""
    if not os.path.exists(path):
        return spark.createDataFrame([], schema)
    return spark.read.csv(path, header=True, schema=schema)


def append_unknown_parts(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    key_cols: tuple[str, ...] = ("estacion", "numero_parte", "fecha"),
) -> int:
    """K4: append ``new_rows`` not already present by ``key_cols``
    (left-anti, Prensas.py:252-262) and rewrite the CSV atomically.
    Returns the number of rows actually appended."""
    existing = read_csv_store(spark, path, new_rows.schema)
    to_add = dedup_append_set(new_rows, existing, list(key_cols))
    n_new = to_add.count()
    if n_new == 0:
        return 0
    combined = existing.unionByName(to_add)
    tmp = tempfile.mkdtemp(prefix="csv_store_")
    try:
        out_dir = os.path.join(tmp, "out")
        combined.coalesce(1).write.csv(out_dir, header=True, mode="overwrite")
        part_file = next(
            os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.startswith("part-") and f.endswith(".csv")
        )
        shutil.move(part_file, path + ".tmp")
        os.replace(path + ".tmp", path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return n_new
