"""Physical-plan inspection helpers."""

from big_data_validator_spark.plans.inspect import (
    executed_plan,
    has_broadcast_join,
    has_take_ordered,
    plan_report,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_ids,
)

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "has_take_ordered",
    "plan_report",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_ids",
]
