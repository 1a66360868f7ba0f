"""Derive-registry breadth: every registered name compiles and the
documented semantics hold on small fixtures."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from polars_pipe_spark.expressions import ALL_DERIVE_FNS, CUMULATIVE_FNS, SCALAR_FNS


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


class TestExplicitOrderContract:
    """r13 (verdict task 4): the ordered-window registry's contract is
    'explicit order or refuse' — rank/row_number must raise like shift
    does, and the pack_* family must refuse the single-partition global
    window unless asked out loud."""

    def test_row_number_requires_order_by(self):
        import pytest

        with pytest.raises(ValueError, match="order_by"):
            CUMULATIVE_FNS["row_number"](col="v")

    def test_rank_defaults_to_value_order(self, spark):
        """r14 (r13 ADVICE): bare ``rank`` is the reference's
        ``pl.Expr.rank()`` — deterministic (equal values, equal ranks)
        with no order key, so it defaults to ordering by the value
        column instead of refusing; reference configs using bare
        'rank' keep working."""
        df = spark.createDataFrame([(3,), (1,), (2,), (2,)], "v long")
        got = sorted(
            (r.v, r.rnk)
            for r in df.select(
                "v", CUMULATIVE_FNS["rank"](col="v").alias("rnk")
            ).collect()
        )
        assert got == [(1, 1), (2, 2), (2, 2), (3, 4)]

    def test_rank_with_explicit_order(self, spark):
        df = spark.createDataFrame([(3,), (1,), (2,)], "v long")
        got = sorted(
            (r.v, r.rnk)
            for r in df.select(
                "v", CUMULATIVE_FNS["rank"](col="v", order_by="v").alias("rnk")
            ).collect()
        )
        assert got == [(1, 1), (2, 2), (3, 3)]

    def test_pack_refuses_global_window(self, spark):
        import pytest

        from polars_pipe_spark.functions.sampling import (
            pack_attention_bins,
            pack_sequences,
            packed_texts,
        )

        df = spark.createDataFrame([("d1", "x", 10)], "doc_id string, text string, n_tok long")
        for call in (
            lambda: pack_sequences(df, "n_tok", "doc_id"),
            lambda: pack_attention_bins(df, "n_tok", "doc_id"),
            lambda: packed_texts(df, "text", "n_tok", "doc_id"),
        ):
            with pytest.raises(ValueError, match="global window"):
                call()

    def test_pack_global_window_opt_in(self, spark):
        from polars_pipe_spark.functions.sampling import pack_sequences

        df = spark.createDataFrame(
            [("a", 100), ("b", 500), ("c", 100)], "doc_id string, n_tok long"
        )
        got = {
            r.doc_id: r.bin_id
            for r in pack_sequences(
                df, "n_tok", "doc_id", bin_tokens=512, allow_global_window=True
            ).collect()
        }
        assert got == {"a": 0, "b": 0, "c": 1}
