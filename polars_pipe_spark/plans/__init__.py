from polars_pipe_spark.plans.introspect import (
    executed_plan,
    optimized_plan_lines,
    pushed_filters,
    scan_read_columns,
)

__all__ = [
    "executed_plan",
    "optimized_plan_lines",
    "pushed_filters",
    "scan_read_columns",
]
