from polars_pipe_spark.operators import inspect, transform, validation

__all__ = ["inspect", "transform", "validation"]
