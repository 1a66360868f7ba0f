"""Shared fixtures: one session-scoped SparkSession, small fixed frames
(the reference uses a tiny employee frame, tests/conftest.py:3-9 — ours
adds nulls and a struct column to exercise declared null/nested semantics).
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest
from pyspark.sql import types as T

from polars_pipe_spark import get_spark

_TESTDATA = "/root/testdata/sf0.001"


def pytest_collection_modifyitems(config, items):
    """Outside the driver environment the generated parquet fixtures
    under /root/testdata may not exist. On a DEV box, skip the tests that
    read them instead of erroring. On CI, missing fixtures are a HARD
    ERROR (r5 ADVICE fix): the workflow generates them with
    ``tools/gen_testdata.py`` before pytest, and silently green-skipping
    the whole data-dependent suite (which is most of it) made the CI
    jobs vacuous for rounds 4-6. Detection is by module source (any test
    whose file references the path), which over-skips a few data-free
    tests in data-less dev runs — an acceptable trade for zero per-test
    annotations to keep in sync."""
    if os.path.isdir(_TESTDATA):
        return
    if os.environ.get("CI"):
        raise pytest.UsageError(
            f"{_TESTDATA} is missing on CI — run "
            "'python tools/gen_testdata.py --sf 0.001 --out "
            f"{_TESTDATA}' first; refusing to green-skip the "
            "data-dependent suite"
        )
    skip = pytest.mark.skip(
        reason="driver-generated testdata not present (see TESTDATA.md)"
    )
    needs_data: dict[str, bool] = {}
    for item in items:
        p = str(item.fspath)
        if p not in needs_data:
            try:
                needs_data[p] = "/root/testdata" in Path(p).read_text()
            except OSError:
                needs_data[p] = False
        if needs_data[p]:
            item.add_marker(skip)


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
