from polars_pipe_spark.adapters.io import FakeIOWrapper, FileType, IOBase, IOWrapper

__all__ = ["FakeIOWrapper", "FileType", "IOBase", "IOWrapper"]
