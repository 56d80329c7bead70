from proglog_spark.plans.audit import (
    assert_no_shuffle,
    count_shuffles,
    executed_plan,
    optimized_plan,
    pushed_filters,
    read_schema,
)
from proglog_spark.plans.observe import with_audit

__all__ = [
    "assert_no_shuffle",
    "count_shuffles",
    "executed_plan",
    "optimized_plan",
    "pushed_filters",
    "read_schema",
    "with_audit",
]
