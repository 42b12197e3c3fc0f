"""T4 — the keyed counter/shift state machine as a Structured
Streaming stateful operator (``applyInPandasWithState``).

Faithful to the reference processor (Prensas.py:616-831):

  * state per (station, part): previous EMITTED counter
    (``contador_registro``), shift-change base (``contador_ct``),
    resumed-run offset (``corrida_previa``), time-of-day of the last
    emit (``hora_cambio``) — all updated ONLY on emit
    (Prensas.py:812-813), which makes the semantics a running-max
    state machine, not a row-lag.
  * emit when counter > prev, or (boundary crossed since last emit
    AND counter >= prev) (Prensas.py:756);
  * at a boundary emit, the base rebases to prev (Prensas.py:759) and
    the running quantity restarts: qty = cnt − base + corrida_previa
    (Prensas.py:787-792).

``emit_mode="row"`` switches prev/hora_cambio to previous-ROW
semantics (the lag-based batch analog in operators.counter_rollup) —
used by the batch↔streaming equivalence test (SURVEY.md §5.3).

Silence cleanup (T5/K5): a processing-time state timeout emits one
``limpieza`` row for the key (Prensas.py:663-677's one-shot latch —
the timeout only fires when no data arrived, and re-registers after
each batch).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "station bigint, part string, ts timestamp, counter bigint, prev_counter bigint, "
    "delta bigint, qty_running bigint, shift_change boolean, shift_id int, plan_date date, "
    "row_kind string"
)

# (prev_counter, base_ct, corrida_previa, last_tod_sec, initialized)
STATE_SCHEMA = "prev_counter bigint, base_ct bigint, corrida_previa bigint, last_tod int, initialized boolean"

_B1 = 8 * 3600
_B2 = 16 * 3600


def _tod_sec(ts: dt.datetime) -> int:
    return ts.hour * 3600 + ts.minute * 60 + ts.second


def _shift(ts: dt.datetime) -> tuple[int, dt.date]:
    if 8 <= ts.hour < 16:
        return 1, ts.date()
    return 2, ts.date() if ts.hour >= 16 else ts.date() - dt.timedelta(days=1)


def _crossed(prev_tod: int, tod: int) -> bool:
    return (prev_tod < _B1 <= tod) or (prev_tod < _B2 <= tod)


def make_state_fn(emit_mode: str = "reference", timeout_ms: int | None = None):
    """Build the applyInPandasWithState function. Separated for unit
    testing: the returned fn is pure given (key, batches, state)."""
    if emit_mode not in ("reference", "row"):
        raise ValueError(f"emit_mode must be 'reference' or 'row', got {emit_mode!r}")

    def fn(key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        station, part = key
        if state.hasTimedOut:
            # T5: silence → one limpieza marker for the key (K5 executes it)
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "station": station,
                        "part": part,
                        "ts": None,
                        "counter": None,
                        "prev_counter": None,
                        "delta": None,
                        "qty_running": None,
                        "shift_change": None,
                        "shift_id": None,
                        "plan_date": None,
                        "row_kind": "limpieza",
                    }
                ]
            )
            return

        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")

        if state.exists:
            prev, base_ct, corrida, last_tod, initialized = state.get
        else:
            prev, base_ct, corrida, last_tod, initialized = 0, None, 0, 0, False

        out: list[dict[str, Any]] = []
        for row in pdf.itertuples(index=False):
            ts: dt.datetime = row.ts.to_pydatetime() if hasattr(row.ts, "to_pydatetime") else row.ts
            counter = int(row.counter)
            tod = _tod_sec(ts)
            if not initialized:
                # admission (Prensas.py:702-741): baseline only, no emit
                prev, last_tod, initialized = counter, tod, True
                continue
            cambio = _crossed(last_tod, tod)
            emits = counter > prev or (cambio and counter >= prev)
            if emits:
                if cambio:
                    base_ct = prev  # rebase (Prensas.py:759)
                delta = counter - prev
                qty_running = counter - (base_ct or 0) + (corrida or 0)
                shift, pdate = _shift(ts)
                out.append(
                    {
                        "station": station,
                        "part": part,
                        "ts": ts,
                        "counter": counter,
                        "prev_counter": prev,
                        "delta": delta,
                        "qty_running": qty_running,
                        "shift_change": cambio,
                        "shift_id": shift,
                        "plan_date": pdate,
                        "row_kind": "update",
                    }
                )
                prev, last_tod = counter, tod  # on-emit update (Prensas.py:812-813)
            if emit_mode == "row":
                prev, last_tod = counter, tod  # lag semantics: every row advances

        state.update((int(prev), None if base_ct is None else int(base_ct), int(corrida), int(last_tod), True))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(out)

    return fn


def counter_state_machine(
    readings: DataFrame,
    *,
    emit_mode: str = "reference",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Group by (station, part) and run the T4 state machine. Input
    needs columns: station, part, ts, event_id, counter."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if timeout_ms is not None else GroupStateTimeout.NoTimeout
    )
    return readings.groupBy("station", "part").applyInPandasWithState(
        make_state_fn(emit_mode, timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
