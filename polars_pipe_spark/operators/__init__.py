from polars_pipe_spark.operators import (
    aggregates,
    cdc,
    inspect,
    joins,
    layout,
    reshape,
    transform,
    validation,
    windows,
)

__all__ = [
    "aggregates",
    "cdc",
    "inspect",
    "joins",
    "layout",
    "reshape",
    "transform",
    "validation",
    "windows",
]
