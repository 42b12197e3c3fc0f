"""Shift / plan-date derivation, cycle-time decode, formatting (C4-C6).

Reference semantics (Prensas.py:543-551, 652-659; SURVEY.md §2.9 C4/C5,
execution-verified 6-case table in FIXTURES.md §C):

  * shift 1 ⇔ 08:00 ≤ time-of-day < 16:00, else shift 2;
  * plan date = calendar date, except before 08:00 it is YESTERDAY
    (the overnight half of shift 2 belongs to the previous plan day);
  * cycle time = ``abs(word_ms / 1000)`` seconds, malformed → 0.0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shift_id(ts: Column) -> Column:
    """C5: shift 1 for 08:00–15:59, shift 2 otherwise (Prensas.py:653-658)."""
    return F.when(F.hour(ts).between(8, 15), F.lit(1)).otherwise(F.lit(2)).cast("int")


def plan_date(ts: Column) -> Column:
    """C5: production plan date; pre-08:00 ticks roll back one day
    (Prensas.py:656-659)."""
    return F.when(F.hour(ts) < 8, F.date_sub(F.to_date(ts), 1)).otherwise(F.to_date(ts))


def cycle_time_seconds(raw: Column) -> Column:
    """C4: PLC milliseconds word → seconds; non-numeric/NULL → 0.0
    (Prensas.py:543-551)."""
    return F.coalesce(F.abs(raw.try_cast("long").cast("double") / F.lit(1000.0)), F.lit(0.0))


def fmt_ts(ts: Column) -> Column:
    """C6: '%Y-%m-%d %H:%M:%S' (Prensas.py:699,713,803)."""
    return F.date_format(ts, "yyyy-MM-dd HH:mm:ss")


def fmt_date(ts: Column) -> Column:
    """C6: '%Y-%m-%d' (Prensas.py:235,243)."""
    return F.date_format(ts, "yyyy-MM-dd")


def is_shift_boundary_crossing(prev_tod_sec: Column, cur_tod_sec: Column) -> Column:
    """W2: the reference's shift-change test (Prensas.py:750-751):
    previous tick's time-of-day strictly before a boundary {08:00,16:00}
    and current at-or-after it. Operates on seconds-since-midnight so it
    is usable in both window and stateful formulations."""
    b1 = F.lit(8 * 3600)
    b2 = F.lit(16 * 3600)
    return ((prev_tod_sec < b1) & (cur_tod_sec >= b1)) | ((prev_tod_sec < b2) & (cur_tod_sec >= b2))


def tod_seconds(ts: Column) -> Column:
    """Time-of-day in seconds since midnight (microseconds truncated,
    mirroring ``now.time().replace(microsecond=0)`` Prensas.py:653)."""
    return (F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)).cast("int")
