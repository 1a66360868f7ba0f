from polars_pipe_spark.sources.tables import load_tables, read_parquet_table

__all__ = ["load_tables", "read_parquet_table"]
