"""W1/W2/A5 — counter-delta detection, shift sessions, quantity roll-up.

The batch (window-function) formulation of the reference's keyed state
machine (Prensas.py:744-815). This is the oracle against which the
streaming stateful op is verified (SURVEY.md §5.3):

  * W1: a reading EMITS when counter > previous counter for the same
    (station, part), or counter >= previous at a shift boundary
    (Prensas.py:756);
  * W2: boundary test = previous time-of-day < {08:00,16:00} ≤ current
    (Prensas.py:750-751);
  * A5: emitted quantity derives from cumulative-counter deltas; the
    per-session total is last(counter) − base(counter), rebased at
    shift change.

Scale note: one shuffle on (station, part) for the lag window, then a
partial-aggregated shuffle on the session keys. Both key sets are
high-cardinality (station × part), so the plan parallelizes evenly; no
window over an unpartitioned frame anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iotdatapipeline_spark.functions.temporal import (
    is_shift_boundary_crossing,
    plan_date,
    shift_id,
    tod_seconds,
)


def with_shift(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """C5 columns: shift_id, plan_date."""
    return df.withColumn("shift_id", shift_id(F.col(ts_col))).withColumn("plan_date", plan_date(F.col(ts_col)))


def counter_deltas(
    df: DataFrame,
    *,
    station_col: str = "station",
    part_col: str = "part",
    counter_col: str = "counter",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = (),
    prev_mode: str = "lag",
) -> DataFrame:
    """Per (station, part) ordered by ts: previous counter, shift-change
    flag, emit flag, and the emitted delta (W1/W2).

    ``order_cols`` breaks ts ties deterministically (e.g. event_id).

    ``prev_mode`` picks the batch analog of the reference's
    ``contador_registro`` state (Prensas.py:812 updates it only ON
    EMIT):

    * ``"lag"`` — prev = previous ROW's counter. Diverges from the
      reference on non-monotone counters (10, 5, 7 emits +2 here,
      nothing there). Kept as the analog of the streaming machine's
      ``emit_mode="row"`` for the batch↔streaming equivalence test.
    * ``"runmax"`` — prev = running max of all prior counters, which
      is EXACTLY the reference's prev (emits happen iff the counter
      sets a new running max, so last-emitted ≡ running max). Emit is
      ``counter > prev`` only: the reference's extra boundary-equality
      emit (``>=`` at a shift change) has delta 0 and never moves the
      quantity, so every delta/qty in this mode matches Prensas.py
      bit-for-bit; only ``emit_count`` can differ by those zero-delta
      rows. The streaming machine + its recursive-CTE oracle
      (plans/streams.py) pin the full semantics including those.
    """
    if prev_mode not in ("lag", "runmax"):
        raise ValueError(f"prev_mode must be 'lag' or 'runmax', got {prev_mode!r}")
    w = Window.partitionBy(station_col, part_col).orderBy(ts_col, *order_cols)
    if prev_mode == "runmax":
        wprev = w.rowsBetween(Window.unboundedPreceding, -1)
        lagged = df.withColumn("__tod", tod_seconds(F.col(ts_col))).select(
            "*",
            F.max(F.col(counter_col)).over(wprev).alias("prev_counter"),
            F.lag(F.col("__tod")).over(w).alias("prev_tod"),
        ).drop("__tod")
        cambio = is_shift_boundary_crossing(F.col("prev_tod"), tod_seconds(F.col(ts_col)))
        emits = F.col(counter_col) > F.col("prev_counter")
        return (
            lagged.withColumn("shift_change", F.coalesce(cambio, F.lit(False)))
            .withColumn("emits", F.coalesce(emits, F.lit(False)))
            .withColumn(
                "delta",
                F.when(
                    F.coalesce(emits, F.lit(False)),
                    F.col(counter_col) - F.col("prev_counter"),
                ),
            )
            .drop("prev_tod")
        )
    # Materialize BOTH lag columns in ONE select over attribute inputs,
    # then derive every flag from the materialized columns. Two things
    # go wrong otherwise (both verified via explain, pinned by
    # tests/test_plans.py): re-invoking lag() inside derived expressions
    # duplicates the window functions, and chaining withColumn puts a
    # Project between the two Window ops so CollapseWindow can't merge
    # them — either way the sorted partition gets TWO window passes.
    lagged = df.withColumn("__tod", tod_seconds(F.col(ts_col))).select(
        "*",
        F.lag(F.col(counter_col)).over(w).alias("prev_counter"),
        F.lag(F.col("__tod")).over(w).alias("prev_tod"),
    ).drop("__tod")
    cambio = is_shift_boundary_crossing(F.col("prev_tod"), tod_seconds(F.col(ts_col)))
    emits = (F.col(counter_col) > F.col("prev_counter")) | (
        cambio & (F.col(counter_col) >= F.col("prev_counter"))
    )
    # Per-emit quantity contribution. Within a session qty_upd =
    # cnt − base (Prensas.py:792) and emits telescope: Σ(cnt_i −
    # prev_i) = last_cnt − base. At a boundary the base is rebased to
    # prev (Prensas.py:759) so the boundary emit contributes cnt − prev
    # to the NEW shift — i.e. delta = cnt − prev uniformly; only the
    # emit condition differs (> vs >= at the boundary).
    return (
        lagged.withColumn("shift_change", F.coalesce(cambio, F.lit(False)))
        .withColumn("emits", F.coalesce(emits, F.lit(False)))
        .withColumn(
            "delta",
            F.when(F.coalesce(emits, F.lit(False)), F.col(counter_col) - F.col("prev_counter")),
        )
        .drop("prev_tod")
    )


def production_rollup(
    events: DataFrame,
    *,
    station_col: str = "station",
    part_col: str = "part",
    counter_col: str = "counter",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = (),
    multiplier: DataFrame | None = None,
    multiplier_key: str = "part",
    multiplier_col: str = "multiplier",
    prev_mode: str = "lag",
) -> DataFrame:
    """A5: per (station, part, plan_date, shift) production quantity =
    sum of emitted positive counter deltas × multiplier (default 1 on a
    missing dimension row — C8/J10, Prensas.py:727-728, 780).

    The multiplier dim joins BROADCAST (it is small by construction in
    the reference — AS400 pieces-per-cycle lookup).

    ``prev_mode="runmax"`` gives the reference's exact on-emit prev
    semantics (see counter_deltas)."""
    d = counter_deltas(
        events,
        station_col=station_col,
        part_col=part_col,
        counter_col=counter_col,
        ts_col=ts_col,
        order_cols=order_cols,
        prev_mode=prev_mode,
    )
    d = with_shift(d, ts_col)
    agg = d.filter(F.col("emits")).groupBy(station_col, part_col, "plan_date", "shift_id").agg(
        F.sum("delta").alias("qty_raw"),
        F.count(F.lit(1)).alias("emit_count"),
        F.max(counter_col).alias("last_counter"),
    )
    if multiplier is None:
        return agg.withColumn("qty", F.col("qty_raw").cast("long"))
    # project the dim to (key, value) under self-describing names that
    # cannot collide with the caller's event columns; both are dropped
    # before return, so the public output schema is unaffected
    dim = multiplier.select(
        F.col(multiplier_key).alias("_dim_part_key"),
        F.col(multiplier_col).alias("_dim_multiplier"),
    )
    joined = agg.join(F.broadcast(dim), agg[part_col] == dim["_dim_part_key"], "left")
    mult = F.coalesce(F.col("_dim_multiplier"), F.lit(1))
    return joined.withColumn("qty", (F.col("qty_raw") * mult).cast("long")).drop(
        "_dim_part_key", "_dim_multiplier"
    )
