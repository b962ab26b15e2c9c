"""Plan-inspection utilities — the scale contract as a public API."""

from .inspect import (  # noqa: F401
    formatted_plan,
    has_broadcast_join,
    has_partition_filters,
    has_pushed_filters,
    has_take_ordered_topk,
    is_all_jvm,
    read_schema_columns,
    shuffle_count,
)
