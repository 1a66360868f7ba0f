from polars_pipe_spark.services.pipeline import build_transform_chain, run_pipeline

__all__ = ["build_transform_chain", "run_pipeline"]
