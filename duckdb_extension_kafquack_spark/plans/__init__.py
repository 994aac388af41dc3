from .explain import (
    analyzed_plan,
    broadcast_hint_count,
    count_exchanges,
    executed_plan,
    final_executed_plan,
    has_partial_aggregation,
    optimized_plan,
    partition_filters,
    pushed_filters,
    read_schemas,
    uses_broadcast_join,
    wholestage_codegen_spans,
)

__all__ = [
    "analyzed_plan",
    "broadcast_hint_count",
    "executed_plan",
    "final_executed_plan",
    "optimized_plan",
    "read_schemas",
    "pushed_filters",
    "partition_filters",
    "count_exchanges",
    "uses_broadcast_join",
    "has_partial_aggregation",
    "wholestage_codegen_spans",
]
