"""Config fingerprinting (C7) — change detection for hot reload (T8).

Reference: ``hashlib.md5(str(config)).hexdigest()`` (Prensas.py:849,
858, 867, 909). We fingerprint a struct of columns via a canonical
JSON rendering, which is stable across partitioning and row order
when applied after an explicit sort.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def config_fingerprint(*cols: Column) -> Column:
    """md5 of the canonical JSON of the given columns."""
    return F.md5(F.to_json(F.struct(*cols)))
