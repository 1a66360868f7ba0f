"""Derive-registry breadth: every registered name compiles and the
documented semantics hold on small fixtures."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from polars_pipe_spark.expressions import ALL_DERIVE_FNS, SCALAR_FNS


def one(spark, schema, row, expr):
    return spark.createDataFrame([row], schema).select(expr.alias("v")).first().v


class TestRegistryBreadth:
    def test_registry_size_documented(self):
        # the public supported-name list (SURVEY §7.4.6): keep >= 120 names
        assert len(ALL_DERIVE_FNS) >= 120

    @pytest.mark.parametrize(
        ("fn", "kwargs", "row", "schema", "expected"),
        [
            ("mod", {"col": "x", "other": 3}, (7,), "x int", 1),
            ("floordiv", {"col": "x", "other": 2}, (7,), "x int", 3),
            ("clip_min", {"col": "x", "lower_bound": 5}, (3,), "x int", 5),
            ("clip_max", {"col": "x", "upper_bound": 5}, (7,), "x int", 5),
            ("to_titlecase", {"col": "s"}, ("hello world",), "s string", "Hello World"),
            ("len_bytes", {"col": "s"}, ("héllo",), "s string", 6),
            ("str_head", {"col": "s", "n": 3}, ("abcdef",), "s string", "abc"),
            ("str_tail", {"col": "s", "n": 3}, ("abcdef",), "s string", "def"),
            ("extract", {"col": "s", "pattern": r"(\d+)"}, ("ab12cd",), "s string", "12"),
            ("count_matches", {"col": "s", "pattern": "a"}, ("banana",), "s string", 3),
            ("repeat_str", {"col": "s", "n": 2}, ("ab",), "s string", "abab"),
            ("list_first", {"col": "l"}, ([5, 6],), "l array<int>", 5),
            ("list_last", {"col": "l"}, ([5, 6],), "l array<int>", 6),
            ("list_get", {"col": "l", "index": 1}, ([5, 6],), "l array<int>", 6),
            ("list_slice", {"col": "l", "offset": 1, "length": 2}, ([1, 2, 3, 4],), "l array<int>", [2, 3]),
            ("least_of", {"col": "x", "other": 5}, (7,), "x int", 5),
            ("greatest_of", {"col": "x", "other": 5}, (7,), "x int", 7),
        ],
    )
    def test_scalar_semantics(self, spark, fn, kwargs, row, schema, expected):
        assert one(spark, schema, row, SCALAR_FNS[fn](**kwargs)) == expected

    def test_date_helpers(self, spark):
        d = dt.datetime(2024, 2, 15, 10, 30)
        schema = "t timestamp"
        assert one(spark, schema, (d,), SCALAR_FNS["days_in_month"](col="t")) == 29
        assert one(spark, schema, (d,), SCALAR_FNS["month_start"](col="t")) == dt.date(2024, 2, 1)
        assert one(spark, schema, (d,), SCALAR_FNS["month_end"](col="t")) == dt.date(2024, 2, 29)
        assert one(spark, schema, (d,), SCALAR_FNS["epoch_seconds"](col="t")) == int(
            d.replace(tzinfo=dt.timezone.utc).timestamp()
        )

    def test_struct_field(self, spark):
        df = spark.createDataFrame([((1, "a"),)], "s struct<x:int,y:string>")
        assert df.select(SCALAR_FNS["struct_field"](col="s", name="y").alias("v")).first().v == "a"

    def test_every_name_is_callable(self):
        for name, fn in ALL_DERIVE_FNS.items():
            assert callable(fn), name
