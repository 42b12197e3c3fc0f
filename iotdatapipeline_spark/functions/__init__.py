"""Pure Column-expression builders (SURVEY.md §2.9)."""

from iotdatapipeline_spark.functions.decode import (
    decode_block,
    expand_block,
    strip_nuls,
    strip_spaces,
    word_to_chars,
)
from iotdatapipeline_spark.functions.fingerprint import config_fingerprint
from iotdatapipeline_spark.functions.partnum import clean_part_scalar, expand_alternatives, exploded_alternatives
from iotdatapipeline_spark.functions.temporal import (
    cycle_time_seconds,
    fmt_date,
    fmt_ts,
    is_shift_boundary_crossing,
    plan_date,
    shift_id,
    tod_seconds,
)

__all__ = [
    "decode_block",
    "expand_block",
    "strip_nuls",
    "strip_spaces",
    "word_to_chars",
    "config_fingerprint",
    "clean_part_scalar",
    "expand_alternatives",
    "exploded_alternatives",
    "cycle_time_seconds",
    "fmt_date",
    "fmt_ts",
    "is_shift_boundary_crossing",
    "plan_date",
    "shift_id",
    "tod_seconds",
]
