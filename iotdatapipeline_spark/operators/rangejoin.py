"""Banded range join — point-in-interval matching as an equi-join.

SURVEY.md §2.4: the reference has no range joins; this is the second
non-equi extension next to ``asof_join``. Spark executes a raw
``points.join(ranges, lo <= p < hi)`` as BroadcastNestedLoopJoin
(fine for a tiny broadcast dim, quadratic disaster otherwise). The
scalable formulation discretizes: every interval is exploded to the
integer bands it overlaps, points key into a single band, and the
join becomes a hash equi-join on the band id with a residual filter.
Cost: |ranges| × (interval width / granularity) replicated build rows
— pick ``granularity`` near the typical interval width so replication
stays O(1) per interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PBAND = "__band_p"
_RBAND = "__band_r"


def band_range_join(
    points: DataFrame,
    ranges: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    granularity: float,
    how: str = "inner",
) -> DataFrame:
    """Join each ``points`` row to every ``ranges`` row with
    ``lo <= point < hi`` (half-open, matching the reference's shift
    bands C5). ``how`` is "inner" or "left" (unmatched points kept with
    null range columns). ``ranges`` column names must not collide with
    ``points``."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    clash = set(ranges.columns) & set(points.columns)
    if clash:
        raise ValueError(f"ranges columns collide with points columns: {sorted(clash)}")
    g = float(granularity)
    lo_band = F.floor(F.col(lo_col) / g).cast("long")
    # hi is exclusive: a range ending exactly on a band edge does not
    # reach into the next band
    hi_band = F.floor((F.col(hi_col) - F.lit(1e-9)) / g).cast("long")
    exploded = ranges.withColumn(_RBAND, F.explode(F.sequence(lo_band, hi_band)))
    keyed = points.withColumn(_PBAND, F.floor(F.col(point_col) / g).cast("long"))
    cond = (F.col(_PBAND) == F.col(_RBAND)) & (
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    if how == "inner":
        return keyed.join(exploded, cond, "inner").drop(_PBAND, _RBAND)
    matched = keyed.join(exploded, cond, "inner").drop(_PBAND, _RBAND)
    unmatched = keyed.join(exploded, cond, "left_anti").drop(_PBAND).withColumns(
        {f.name: F.lit(None).cast(f.dataType) for f in ranges.schema.fields}
    )
    return matched.unionByName(unmatched)
