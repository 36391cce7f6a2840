from genie_spark.operators.intervals import interval_join, interval_semi_join, interval_anti_join
from genie_spark.operators.upsert import upsert_diff, apply_upsert
from genie_spark.operators.filters import (
    semi_filter,
    anti_filter,
    keep_samples,
    retract_cascade,
    group_count_filter,
)
from genie_spark.operators.windows import adjacent_pairs, latest_per_key

__all__ = [
    "interval_join",
    "interval_semi_join",
    "interval_anti_join",
    "upsert_diff",
    "apply_upsert",
    "semi_filter",
    "anti_filter",
    "keep_samples",
    "retract_cascade",
    "group_count_filter",
    "adjacent_pairs",
    "latest_per_key",
]
