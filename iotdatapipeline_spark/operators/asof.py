"""As-of (point-in-time) join — an operator class the reference does
not have (SURVEY.md §2.4: "No theta, range, as-of … joins exist"), but
the natural extension of its latest-snapshot probe (K8/S5): attach to
each fact row the most recent dimension/state row at or before the
fact's timestamp.

Spark has no built-in as-of join, and the naive formulation
(``probe.join(build, keys + (probe.ts >= build.ts))`` + top-1) is a
range join that degenerates to a per-key cartesian product — quadratic
in build rows per key, hopeless at 100 TB.  The scalable formulation
used here is the union-merge: tag both sides, union them, and
forward-fill the build columns over a single (keys)-partitioned
(ts)-ordered window.  One shuffle + one sort, linear in rows, no
cartesian blow-up, and the partition key is the join key so skew
handling (AQE / salting) composes normally.

Parallelism caveat: the plain path sorts one partition per key, so a
LOW-cardinality key set (e.g. 150 stations against 1000 executors)
under-parallelizes. Pass ``bucket`` (a monotone function of the
timestamp, e.g. ``F.to_date("ts")``) to switch to the bucketed
formulation: the big window partitions by (key, bucket) — parallelism
∝ keys × buckets — and a second, tiny window over one row per
(key, bucket) forward-fills the carry across bucket boundaries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_BKT = "__asof_bucket"
_VALS = "__asof_vals"
_CARRY = "__asof_carry"


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    *,
    on: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    bucket: Column | None = None,
) -> DataFrame:
    """Left as-of join: every ``probe`` row gains ``value_cols`` from
    the latest ``build`` row with ``build[ts_col] <= probe[ts_col]``
    and equal ``on`` keys; no prior build row → null.

    ``build`` must be unique per (on, ts_col) — with duplicates the
    "latest" row at a tied timestamp is distribution-dependent.
    Pre-aggregate (e.g. ``latest_snapshot`` or max_by) before calling.
    ``value_cols`` must not collide with ``probe`` columns; ``ts_col``
    must be non-null on both sides.

    ``bucket``, if given, must be a non-decreasing function of
    ``ts_col`` (same expression evaluates on both sides); results are
    identical to the plain path, only the partitioning changes.
    """
    on = list(on)
    clash = set(value_cols) & set(probe.columns)
    if clash:
        raise ValueError(f"value_cols collide with probe columns: {sorted(clash)}")

    build_types = {f.name: f.dataType for f in build.schema.fields}
    probe_types = {f.name: f.dataType for f in probe.schema.fields}
    probe_only = [c for c in probe.columns if c not in on and c != ts_col]

    # Build rows sort BEFORE probe rows at an equal timestamp (side 0 < 1)
    # so a build row taking effect exactly at the probe's ts is included.
    probe_side = probe.withColumns(
        {c: F.lit(None).cast(build_types[c]) for c in value_cols} | {_SIDE: F.lit(1)}
    )
    build_side = build.select(*on, ts_col, *value_cols).withColumns(
        {c: F.lit(None).cast(probe_types[c]) for c in probe_only} | {_SIDE: F.lit(0)}
    )
    unified = probe_side.unionByName(build_side.select(*probe_side.columns))

    if bucket is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(ts_col, _SIDE)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unified.withColumns(
            {c: F.last(c, ignorenulls=True).over(w) for c in value_cols}
        )
        return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)

    unified = unified.withColumn(_BKT, bucket)
    # r14 (guide §2.4 duplicated subtrees, §5 localCheckpoint): the
    # bucketed path reads `unified` three times (per-bucket latest,
    # spine, final window pass); lazily truncating the lineage here
    # computes the union ONCE per action and the consumers read the
    # materialized partitions instead of re-deriving it (the narrow
    # consumers column-prune, so the lazy form re-scans less than 3×,
    # but the x10 ABBA still reads 2.155 → 1.775 s —
    # tools/bench_asof_ckpt_ab.py). eager=False: no job at plan build,
    # nothing cached across actions beyond this DataFrame's lifetime.
    unified = unified.localCheckpoint(eager=False)

    # Latest build values per (key, bucket) — one row per group, tiny.
    per_bucket = (
        unified.filter(F.col(_SIDE) == 0)
        .groupBy(*on, _BKT)
        .agg(F.max_by(F.struct(*value_cols), F.col(ts_col)).alias(_VALS))
    )
    # Spine of every (key, bucket) either side touches; forward-fill the
    # carry over STRICTLY PRIOR buckets (current bucket's own build rows
    # are already in its partition).
    spine = unified.select(*on, _BKT).distinct()
    wb = (
        Window.partitionBy(*on)
        .orderBy(_BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        spine.join(per_bucket, on + [_BKT], "left")
        .withColumn(_CARRY, F.last(_VALS, ignorenulls=True).over(wb))
        .filter(F.col(_CARRY).isNotNull())
    )
    # Synthetic bucket-opening build rows: null ts sorts first (asc
    # nulls-first), so the carry is in force before any real row.
    carry_rows = carry.select(
        *on,
        F.lit(None).cast(probe_types[ts_col]).alias(ts_col),
        *[F.col(_CARRY)[c].alias(c) for c in value_cols],
        *[F.lit(None).cast(probe_types[c]).alias(c) for c in probe_only],
        F.lit(-1).alias(_SIDE),
        F.col(_BKT),
    )
    w2 = (
        Window.partitionBy(*on, _BKT)
        .orderBy(F.asc_nulls_first(ts_col), _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unified.unionByName(carry_rows.select(*unified.columns)).withColumns(
        {c: F.last(c, ignorenulls=True).over(w2) for c in value_cols}
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE, _BKT)
