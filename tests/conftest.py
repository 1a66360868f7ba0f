"""Shared fixtures: one session-scoped SparkSession, small fixed frames
(the reference uses a tiny employee frame, tests/conftest.py:3-9 — ours
adds nulls and a struct column to exercise declared null/nested semantics).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from polars_pipe_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="polars_pipe_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def employees(spark):
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("age", T.LongType()),
            T.StructField("salary", T.DoubleType()),
            T.StructField("bonus", T.DoubleType()),
            T.StructField("projects", T.StructType(
                [
                    T.StructField("a", T.DoubleType()),
                    T.StructField("b", T.DoubleType()),
                ]
            )),
        ]
    )
    rows = [
        ("  Alice ", 30, 50000.0, 5000.0, (0.5, 0.5)),
        ("Bob", 25, 42000.0, None, (1.0, None)),
        ("CHARLIE", 35, 71000.0, 2000.0, (None, 0.25)),
        ("dave", None, 47000.0, 1000.0, (0.1, 0.9)),
        ("Eve", 41, 53000.0, 7000.0, (0.3, 0.7)),
    ]
    return spark.createDataFrame(rows, schema)
