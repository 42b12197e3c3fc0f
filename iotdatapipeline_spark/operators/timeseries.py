"""Reusable time-series operators: gaps-and-islands run collapsing,
regular-grid resampling with forward-fill, and ordered-funnel stage
attainment.  The registered queries in ``plans/timeseries.py`` and
``plans/behavioral.py`` are thin bindings of these onto the fixture
tables; the operators themselves take any DataFrame.

Design: every operator is a pure DataFrame → DataFrame function whose
only shuffles are on the entity key — each key's timeline is processed
independently, so the operators scale horizontally with executors.
Orderings are explicit (caller-supplied tie-break columns) so results
are deterministic under any partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse_islands(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("station",),
    state_col: str = "event_type",
    order_cols: Sequence[str] = ("ts", "event_id"),
    ts_col: str = "ts",
) -> DataFrame:
    """Collapse consecutive equal-``state_col`` observations per key
    into runs (gaps-and-islands; the SCD2 validity-interval build).

    Returns one row per run: ``keys…, state_col, run_id, valid_from,
    valid_to, n_obs`` where ``run_id`` numbers runs 1.. per key in
    ``order_cols`` order.

    Shape: the change flag (lag) and the running run-id sum share one
    window partitioning on ``keys``; the closing groupBy refines that
    partitioning, so the whole operator is one shuffle.
    """
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    chg = F.when(
        F.lag(state_col).over(w).eqNullSafe(F.col(state_col)), F.lit(0)
    ).otherwise(F.lit(1))
    runs = df.withColumn("_chg", chg).withColumn(
        "run_id",
        F.sum("_chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return runs.groupBy(*keys, state_col, "run_id").agg(
        F.min(ts_col).alias("valid_from"),
        F.max(ts_col).alias("valid_to"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def resample_ffill(
    df: DataFrame,
    *,
    key: str = "station",
    ts_col: str = "ts",
    value_col: str = "v_cents",
    step: str = "1 hour",
    trunc_unit: str = "hour",
    tiebreak_cols: Sequence[str] = ("ts", "event_id"),
    out_ts: str = "bucket_ts",
) -> DataFrame:
    """Resample each key's readings onto a regular grid (global
    min..max of ``ts_col`` truncated to ``trunc_unit``, stepping by
    ``step``), carrying the last observed ``value_col`` forward into
    empty buckets.  Buckets before a key's first observation stay
    NULL — forward-fill never fabricates.

    Returns ``key, out_ts, value_col``.

    Shape (r13): every shuffle stays on the OBSERVATIONS, never on the
    grid.  The previous shape generated the full key×bucket spine
    (|keys|·|span| rows), shuffled it through a left join against the
    observations, and ran the fill window over it — the grid paid the
    exchange.  Now the per-bucket "last reading" (a row_number()=1
    window Spark executes with WindowGroupLimit: one surviving row per
    cell per map task BEFORE the shuffle) feeds ONE per-key window
    computing the running non-null fill value and the neighbour
    buckets, and the grid rows are GENERATED from each observation row
    by exploding ``sequence(bucket, next_bucket − step)`` with the
    fill value already attached — a pure projection.  Leading cells
    (before a key's first observation) come from the same row via the
    1-row global-bounds broadcast and stay NULL.  At 100 TB the
    shuffled bytes track the sensor-reading count, not
    keys × calendar span.

    A bucket whose top-1 reading has a NULL value carries the previous
    non-null value forward (it resets nothing) — same semantics as the
    ignore-nulls fill over the joined spine.
    """
    ev = df.withColumn("_b", F.date_trunc(trunc_unit, F.col(ts_col)))
    order = [F.desc(c) for c in tiebreak_cols]
    w_rn = Window.partitionBy(key, "_b").orderBy(*order)
    obs = (
        ev.withColumn("_rn", F.row_number().over(w_rn))
        .filter(F.col("_rn") == 1)
        .select(key, "_b", value_col)
    )
    bounds = ev.agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("_h0"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("_h1"),
    )
    wk = Window.partitionBy(key).orderBy("_b")
    run = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg = obs.select(
        key,
        "_b",
        F.lag("_b").over(wk).alias("_pb"),
        F.lead("_b").over(wk).alias("_nb"),
        F.last(value_col, ignorenulls=True).over(run).alias("_fv"),
    ).crossJoin(F.broadcast(bounds))
    empty = F.expr("CAST(array() AS array<timestamp>)")
    cells = F.concat(
        F.when(
            F.col("_pb").isNull() & (F.col("_h0") < F.col("_b")),
            F.expr(f"sequence(_h0, _b - interval {step}, interval {step})"),
        ).otherwise(empty),
        F.expr(f"sequence(_b, coalesce(_nb - interval {step}, _h1), interval {step})"),
    )
    return seg.select(key, "_b", "_fv", F.explode(cells).alias(out_ts)).select(
        key,
        out_ts,
        # cells before the key's first observed bucket have nothing to
        # carry; every cell at-or-after its source bucket fills with
        # the running non-null value (for the bucket itself that IS the
        # observation when non-null)
        F.when(F.col(out_ts) >= F.col("_b"), F.col("_fv")).alias(value_col),
    )


def resample_interpolate(
    df: DataFrame,
    *,
    key: str = "station",
    ts_col: str = "ts",
    value_col: str = "v_cents",
    step: str = "1 hour",
    trunc_unit: str = "hour",
    tiebreak_cols: Sequence[str] = ("ts", "event_id"),
    out_ts: str = "bucket_ts",
) -> DataFrame:
    """Resample each key's readings onto a regular grid, LINEARLY
    interpolating empty buckets between the surrounding observations
    (time-weighted between the last observed bucket at-or-before and
    the first at-or-after).  Buckets outside a key's observed span
    stay NULL — interior interpolation only, no extrapolation.

    ``value_col`` must be integral (e.g. cents); the interpolated
    value is ``prev + floor((next−prev)·Δt/Δspan)`` with the division
    in double — every term is exact in IEEE double far below 2^53, so
    the result is bit-identical across engines.

    Returns ``key, out_ts, value_col``.

    Shape (r8, reworked r13): every shuffle stays on the
    OBSERVATIONS, never on the grid (the pre-r8 shape shuffled the
    full |keys|·|span| spine through a join and two window passes —
    ~9 M rows to fill a 60 k-row observation set at sf0.1).  The r8
    form still paid the observation subtree TWICE: a Union whose edge
    branch re-ran the per-bucket top-1 window just to recover each
    key's first/last observed bucket, plus a distinct-keys scan —
    4 scans of the input and 5 exchanges in the executed plan.  Now
    ONE stream of per-(key, bucket) top-1 rows (null values KEPT so
    every key anchors its span) flows through a single per-key window
    that attaches, to each row: the neighbouring stream buckets
    (lag/lead), the last non-null value/bucket at-or-before
    (ignore-nulls running frame), and the first non-null value/bucket
    strictly-after (ignore-nulls forward frame).  Each row then
    GENERATES its grid cells — leading span from the 1-row global
    bounds broadcast when it is the key's first row, its own bucket,
    and the gap up to the next stream bucket (or the trailing span to
    the global end when it is the last) — with the interpolation
    formula as a plain projection: 2 scans, 2 exchanges, no join, no
    Union.  A k-bucket gap is k generated rows from one segment row;
    nothing is quadratic in gap length, and at 100 TB the shuffled
    bytes track the sensor-reading count, not keys × calendar span.

    A bucket whose top-1 reading has a NULL value is treated as
    UNOBSERVED (interpolated across, never a boundary) — same
    semantics as the ignore-nulls window formulation and the DuckDB
    oracle.
    """
    ev = df.withColumn("_b", F.date_trunc(trunc_unit, F.col(ts_col)))
    order = [F.desc(c) for c in tiebreak_cols]
    w_rn = Window.partitionBy(key, "_b").orderBy(*order)
    v = F.col(value_col)
    obs = (
        ev.withColumn("_rn", F.row_number().over(w_rn))
        .filter(F.col("_rn") == 1)
        .select(key, "_b", value_col)
    )
    bounds = ev.agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("_h0"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("_h1"),
    )
    wk = Window.partitionBy(key).orderBy("_b")
    run = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fut = wk.rowsBetween(1, Window.unboundedFollowing)
    # bucket timestamp of a non-null observation — the ignore-nulls
    # scans over THIS column give the interpolation anchors (a null
    # top-1 contributes neither a value nor an anchor)
    nn_b = F.when(v.isNotNull(), F.col("_b"))
    seg = obs.select(
        key,
        "_b",
        value_col,
        F.lag("_b").over(wk).alias("_pb"),
        F.lead("_b").over(wk).alias("_nb"),
        F.last(value_col, ignorenulls=True).over(run).alias("_pv"),
        F.last(nn_b, ignorenulls=True).over(run).alias("_pt"),
        F.first(value_col, ignorenulls=True).over(fut).alias("_nv"),
        F.first(nn_b, ignorenulls=True).over(fut).alias("_nt"),
    ).crossJoin(F.broadcast(bounds))
    empty = F.expr("CAST(array() AS array<timestamp>)")
    cells = F.concat(
        F.when(
            F.col("_pb").isNull() & (F.col("_h0") < F.col("_b")),
            F.expr(f"sequence(_h0, _b - interval {step}, interval {step})"),
        ).otherwise(empty),
        F.expr(f"sequence(_b, coalesce(_nb - interval {step}, _h1), interval {step})"),
    )
    e = F.unix_timestamp(F.col(out_ts))
    pt = F.unix_timestamp(F.col("_pt"))
    nt = F.unix_timestamp(F.col("_nt"))
    interp = F.col("_pv") + F.floor(
        (F.col("_nv") - F.col("_pv")).cast("double")
        * (e - pt).cast("double")
        / (nt - pt).cast("double")
    ).cast("long")
    return seg.select(
        key, value_col, "_b", "_nb", "_pv", "_pt", "_nv", "_nt",
        F.explode(cells).alias(out_ts),
    ).select(
        key,
        out_ts,
        # leading cells (before the key's first stream bucket) and
        # trailing cells (after its last) stay NULL — no
        # extrapolation; an observed non-null bucket keeps its value
        # verbatim; everything else interpolates between the non-null
        # anchors when both exist
        F.when(F.col(out_ts) < F.col("_b"), F.lit(None))
        .when((F.col(out_ts) == F.col("_b")) & v.isNotNull(), v)
        .when(F.col("_nb").isNull() & (F.col(out_ts) > F.col("_b")), F.lit(None))
        .when(F.col("_pv").isNotNull() & F.col("_nv").isNotNull(), interp)
        .cast("long")
        .alias(value_col),
    )


def ordered_funnel(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    stages: Sequence[str] = ("view", "click", "purchase"),
    window_expr: str = "INTERVAL 48 HOURS",
) -> DataFrame:
    """Ordered funnel over ``stages``: per user, ``t1`` is the first
    stage-1 event; ``t{i}`` is the first stage-``i`` event in
    ``[t{i-1}, t{i-1} + window)``.  Users who never reach stage 1 are
    absent; unreached later stages are NULL.

    Returns ``user_col, t1..t{len(stages)}``.

    Shape (r13, guide §2.4 remove shuffles outright): every hop is a
    whole-partition MIN over the user key — ``t1`` is the min stage-1
    time, ``t{i}`` the min stage-``i`` time satisfying ``t{i-1}``'s
    window — so all hops are unordered window aggregates over ONE
    user-keyed partitioning, chained in sequence (each hop's predicate
    reads the previous hop's window output). The previous form built
    each hop as fact ⋈ prior-frame + groupBy and then LEFT-joined every
    hop back together: each join side re-executed the whole prior
    subtree, costing 7 scans / 6 joins / 6 exchanges for 3 stages. Now:
    1 scan, 1 exchange, 0 joins; the final per-user reduction reuses
    the window's partitioning (no second shuffle).
    """
    ev = df.select(user_col, type_col, ts_col)
    w = Window.partitionBy(user_col)
    cur = ev.withColumn(
        "t1", F.min(F.when(F.col(type_col) == stages[0], F.col(ts_col))).over(w)
    )
    for i, stage in enumerate(stages[1:], start=2):
        tcol, out = f"t{i - 1}", f"t{i}"
        qual = F.when(
            (F.col(type_col) == stage)
            & (F.col(ts_col) >= F.col(tcol))
            & (F.col(ts_col) < F.col(tcol) + F.expr(window_expr)),
            F.col(ts_col),
        )
        cur = cur.withColumn(out, F.min(qual).over(w))
    tcols = [f"t{i}" for i in range(1, len(stages) + 1)]
    return (
        cur.filter(F.col("t1").isNotNull())
        .groupBy(user_col)
        .agg(*[F.min(c).alias(c) for c in tcols])
    )


def merge_islands(
    *run_frames: DataFrame,
    keys: Sequence[str] = ("station",),
    state_col: str = "event_type",
    ts_from: str = "valid_from",
    ts_to: str = "valid_to",
    n_col: str = "n_obs",
) -> DataFrame:
    """Associatively MERGE gaps-and-islands run frames (outputs of
    :func:`collapse_islands` over time-disjoint slices of a log):
    adjacent runs with the same state fuse (their observation counts
    add, their validity intervals union), everything else passes
    through, and ``run_id`` is renumbered 1.. per key in time order —
    so ``merge(islands(A), islands(B)) ≡ islands(A ∪ B)`` whenever
    each key's rows in A all precede its rows in B.

    This is incremental maintenance for a NON-additive stateful
    aggregation: at 100 TB you keep the collapsed run table, fold in
    each new day's runs (touching only run-count rows, never the raw
    log), and provably never recompute history. The equivalence is
    hash-checked by the ``events_islands_incremental`` gate.

    Shape: one union (no shuffle), then the same single-exchange
    change-flag/run-sum/groupBy pipeline as ``collapse_islands``, but
    over RUN rows (≈ log size / mean run length), not the log.
    """
    from functools import reduce

    cols = [*keys, state_col, ts_from, ts_to, n_col]
    combined = reduce(
        lambda a, b: a.unionByName(b), (f.select(*cols) for f in run_frames)
    )
    w = Window.partitionBy(*keys).orderBy(ts_from)
    chg = F.when(
        F.lag(state_col).over(w).eqNullSafe(F.col(state_col)), F.lit(0)
    ).otherwise(F.lit(1))
    grouped = combined.withColumn("_chg", chg).withColumn(
        "_grp",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    merged = grouped.groupBy(*keys, state_col, "_grp").agg(
        F.min(ts_from).alias(ts_from),
        F.max(ts_to).alias(ts_to),
        F.sum(n_col).alias(n_col),
    )
    w_rn = Window.partitionBy(*keys).orderBy(ts_from)
    return merged.select(
        *keys,
        state_col,
        F.row_number().over(w_rn).cast("long").alias("run_id"),
        ts_from,
        ts_to,
        F.col(n_col).cast("long").alias(n_col),
    )
