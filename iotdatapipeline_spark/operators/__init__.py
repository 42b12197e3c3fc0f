"""Batch relational operators (SURVEY.md §2)."""

from iotdatapipeline_spark.operators.counter_rollup import (
    counter_deltas,
    production_rollup,
    with_shift,
)
from iotdatapipeline_spark.operators.asof import asof_join
from iotdatapipeline_spark.operators.dedup_combine import dedup_combine
from iotdatapipeline_spark.operators.rangejoin import band_range_join
from iotdatapipeline_spark.operators.skew import (
    salted_agg,
    salted_broadcast_left,
)
from iotdatapipeline_spark.operators.timeseries import (
    collapse_islands,
    ordered_funnel,
    resample_ffill,
)
from iotdatapipeline_spark.operators.relational import (
    config_regroup,
    dedup_append_set,
    enrich_multiplier,
    guarded_insert_split,
    latest_snapshot,
    limpieza_update_set,
    argmax_per_group,
    argmax_per_group_hash,
    argmax_per_group_struct,
    packed_major,
    packed_minor,
    packed_order,
    top1_per_group,
)

__all__ = [
    "asof_join",
    "band_range_join",
    "counter_deltas",
    "production_rollup",
    "with_shift",
    "dedup_combine",
    "config_regroup",
    "dedup_append_set",
    "enrich_multiplier",
    "guarded_insert_split",
    "latest_snapshot",
    "limpieza_update_set",
    "argmax_per_group",
    "argmax_per_group_hash",
    "argmax_per_group_struct",
    "packed_major",
    "packed_minor",
    "packed_order",
    "top1_per_group",
    "salted_agg",
    "salted_broadcast_left",
    "collapse_islands",
    "ordered_funnel",
    "resample_ffill",
]
