"""Stats-table tests (model: reference tests/core/test_inspect.py golden
describe table — here asserted against exact expected values for the
employee fixture, string-typed long format)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_pipe_spark.operators.inspect import describe_df


def as_map(stats_df):
    rows = stats_df.collect()
    return {r.statistic: r.asDict() for r in rows}


class TestDescribe:
    def test_shape_and_exact_values(self, spark):
        df = spark.createDataFrame(
            [(0.0, "x"), (1.0, "y"), (2.0, None)], "v double, s string"
        )
        m = as_map(describe_df(df))
        assert list(m) == [
            "count", "null_count", "mean", "std", "min", "25%", "50%", "75%", "max",
            "null_proportion", "n_unique",
        ]
        assert m["count"]["v"] == "3"
        assert m["count"]["s"] == "2"  # F.count skips nulls (Polars counts non-null too)
        assert m["null_count"]["s"] == "1"
        assert m["mean"]["v"] == "1.0"
        assert m["25%"]["v"] == "0.5"  # exact linear-interp percentile
        assert m["50%"]["v"] == "1.0"
        assert m["mean"]["s"] is None  # non-numeric → null cell
        assert m["min"]["s"] == "x"
        assert m["null_proportion"]["s"] == str(1 / 3)
        assert m["n_unique"]["v"] == "3"

    def test_custom_statistics(self, employees):
        m = as_map(
            describe_df(
                employees,
                custom_statistics={"n_distinct_ages": lambda c: F.countDistinct(F.col(c))},
            )
        )
        assert "n_distinct_ages" in m
        assert m["n_distinct_ages"]["age"] == "4"

    def test_single_job(self, employees):
        # all statistics must come from ONE aggregation pass — the plan is
        # a single collect; smoke-check it returns without error on a frame
        # with struct cols present (struct cols get null numeric cells).
        m = as_map(describe_df(employees))
        assert m["mean"]["projects"] is None
        assert m["count"]["projects"] == "5"
