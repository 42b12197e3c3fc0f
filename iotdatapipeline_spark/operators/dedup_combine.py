"""A1 dedup-combine (``combinar_listas``, Prensas.py:399-440).

Semantics (execution-verified, SURVEY.md §2.5 A1):
  * each slash-alternative of a reading receives the FULL counter value
    (fan-out via explode, not a split);
  * rows with NULL/empty cleaned part are dropped (F1);
  * then per (grouping keys, part): counters SUM, original keeps the
    FIRST-seen value, cycle time keeps the LAST-seen value, plus the
    ordered list of contributing counters.

The reference relies on Python iteration order for first/last; we make
the order explicit with an ``order_col`` (reading sequence / ts) so the
result is deterministic under distribution — ``min_by``/``max_by``
replace order-dependent dict mutation. This is a single partial-agg →
shuffle → final-agg hash aggregation; no UDAF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_combine(
    readings: DataFrame,
    *,
    keys: Sequence[str],
    part_alts_col: str | None = None,
    original_col: str,
    counter_col: str,
    cycle_time_col: str,
    order_col: str,
    collect_counters: bool = True,
    raw_part_col: str | None = None,
) -> DataFrame:
    """Explode alternatives, filter empties, merge duplicates.

    Pass EITHER ``raw_part_col`` (the uncleaned part string — expansion
    happens here via ``functions.exploded_alternatives``, whose
    plan-level fast/general dispatch keeps the common spaceless shape
    inside whole-stage codegen; 3.2× on the gate query) OR
    ``part_alts_col`` (a precomputed array<string> from
    ``functions.expand_alternatives``). Output columns:
    keys…, part, part_original, counter_total, [counters,] cycle_time.

    ``collect_counters=False`` drops the ordered per-part counter list
    (the reference keeps it at :420-421, but most consumers only need
    the merged scalars) — a collect_list over the widest column is the
    single biggest cost of this aggregate, so skip it when the list
    isn't consumed.
    """
    if (part_alts_col is None) == (raw_part_col is None):
        raise ValueError("pass exactly one of part_alts_col / raw_part_col")
    if raw_part_col is not None:
        from iotdatapipeline_spark.functions.partnum import exploded_alternatives

        if not collect_counters and original_col == raw_part_col:
            # Two-stage formulation (r10, measured 0.478 s → 0.424 s at
            # sf0.1 and structurally better at scale): Spark has NO
            # var-length hash-aggregation buffers — min_by/max_by with a
            # string value plans SortAggregate, sorting the full exploded
            # set on both sides of the shuffle. Group KEYS may be
            # strings, though, so stage 1 compacts by (keys, raw string)
            # with all-NUMERIC buffers (pure HashAggregate with map-side
            # partials over the full data), and the unavoidable string
            # argmin runs in stage 2 over the compacted distinct-part
            # set — thousands of rows instead of every reading. Only
            # valid when the original kept per group IS the raw string
            # (it rides along as the stage-1 group key) and the counter
            # list is not collected.
            s1 = readings.groupBy(*keys, raw_part_col).agg(
                F.sum(counter_col).alias("__ct"),
                F.count(F.lit(1)).alias("__n"),
                F.min(order_col).alias("__omin"),
                F.max(order_col).alias("__omax"),
                F.max_by(F.col(cycle_time_col), F.col(order_col)).alias("__cyc"),
            )
            # Expression-level expansion here, NOT exploded_alternatives'
            # plan-level two-branch dispatch (r13, guide §2.4): the union's
            # complementary branch filters push BELOW the stage-1 aggregate,
            # so the source was scanned and partially aggregated TWICE (one
            # full extra pass just to prove the space-branch empty). On the
            # already-compacted stage-1 output (~distinct keys×parts rows,
            # thousands not millions at any scale) the interpreted HOF fold
            # costs microseconds total — strictly cheaper than a duplicated
            # codegen subtree over the full input. Row-for-row equivalent
            # (pinned by TestExplodedAlternatives + the fast==slow pin).
            from iotdatapipeline_spark.functions.partnum import expand_alternatives

            ex2 = s1.withColumn(
                "part", F.explode(expand_alternatives(F.col(raw_part_col)))
            ).filter(F.col("part").isNotNull() & (F.col("part") != ""))
            return ex2.groupBy(*keys, "part").agg(
                F.sum("__ct").alias("counter_total"),
                F.sum("__n").alias("n_readings"),
                F.min_by(F.col(raw_part_col), F.col("__omin")).alias("part_original"),
                F.max_by(F.col("__cyc"), F.col("__omax")).alias("cycle_time"),
            )
        exploded = exploded_alternatives(readings, F.col(raw_part_col), out="part")
    else:
        exploded = readings.withColumn("part", F.explode(F.col(part_alts_col)))
    filtered = exploded.filter(F.col("part").isNotNull() & (F.col("part") != ""))
    aggs = [
        F.sum(counter_col).alias("counter_total"),
        F.count(F.lit(1)).alias("n_readings"),
    ]
    if collect_counters:
        # struct-ordered collect keeps the per-part counter list in reading order
        aggs.append(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(counter_col).alias("c")))
                ),
                lambda s: s["c"],
            ).alias("counters")
        )
    aggs += [
        F.min_by(F.col(original_col), F.col(order_col)).alias("part_original"),
        F.max_by(F.col(cycle_time_col), F.col(order_col)).alias("cycle_time"),
    ]
    return filtered.groupBy(*keys, "part").agg(*aggs)
