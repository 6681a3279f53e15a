from .inspect import (
    physical_plan,
    has_pushed_filters,
    scan_read_schema,
    uses_broadcast_join,
    count_exchanges,
    count_broadcast_hints,
    whole_stage_codegen_spans,
)

__all__ = [
    "physical_plan",
    "has_pushed_filters",
    "scan_read_schema",
    "uses_broadcast_join",
    "count_exchanges",
    "count_broadcast_hints",
    "whole_stage_codegen_spans",
]
