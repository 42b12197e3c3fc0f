"""Idempotent plan-build-time materialization — the pay-once pattern.

Two gates share this shape (and more can): an expensive derivation
(JSON parse, PQ codebook training) is paid ONCE into a VersionedTable
keyed by a content fingerprint of the source dataset, and the
registered query is the steady-state read over the typed/compressed
result. This is the 100 TB answer to any re-derive-per-query floor:
on a cluster the ingest is a scheduled job and every consumer scans
the materialized table (see plans/olap.py events_props_shredded and
plans/analytics.py embeddings_pq_index_topk for the measured trades).

Concurrency: builders race safely on the versioned commit — the loser
of the atomic manifest link sees ``version() != 0`` (it lost before
starting) or ``CommitConflict`` (both wrote) and reads the winner's
v1, which is bit-identical because every materialized derivation here
is deterministic.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from iotdatapipeline_spark.sources.versioned import CommitConflict, VersionedTable


def dataset_fingerprint(sf_dir: str, table: str) -> str:
    """Content fingerprint of one fixture table: source path plus a
    (name, size, mtime_ns) triple per parquet part. A REGENERATED
    dataset at the same path gets a fresh digest, so a cached
    materialization is never stale (mtime_ns, not second-granularity
    mtime: same-second in-place regeneration with identical sizes must
    still miss the cache)."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    parts = sorted(os.listdir(path)) if os.path.isdir(path) else [path]
    fp = [os.path.abspath(sf_dir)]
    for p in parts:
        full = os.path.join(path, p) if os.path.isdir(path) else p
        st = os.stat(full)
        fp.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(fp).encode()).hexdigest()[:12]


def materialize_once(
    spark: SparkSession,
    root: str,
    build: Callable[[], DataFrame],
    *,
    cluster_by: Sequence[str] | None = None,
) -> VersionedTable:
    """Create-if-absent a VersionedTable at ``root`` from ``build()``
    (not called when the table already exists — the point is to skip
    the expensive derivation). Returns the table, version >= 1."""
    t = VersionedTable(spark, root)
    if t.version() == 0:
        # build() runs OUTSIDE the race-loss handler: a ValueError
        # raised by the caller's derivation is a genuine build failure
        # and must propagate, not read as a lost create race
        df = build()
        try:
            t.create(df, cluster_by=list(cluster_by) if cluster_by else None)
        except (ValueError, CommitConflict):
            # lost the create race: a concurrent builder committed v1
            # first (ValueError from the version()!=0 pre-check when it
            # landed before ours started; CommitConflict from the
            # atomic manifest link when both wrote) — either way v1
            # exists and holds the identical deterministic derivation,
            # UNLESS no winner actually committed, which is a real error
            if t.version() == 0:
                raise
    return t
