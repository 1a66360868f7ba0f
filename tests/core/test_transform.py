"""Operator unit tests (model: reference tests/core/test_transform.py and
test_derive_cols.py — tiny frames, exact expected values, error contracts)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from polars_pipe_spark.operators import transform as tf


def names(df):
    return df.columns


class TestLineage:
    def test_add_hash_col_deterministic_and_idempotent(self, employees):
        h1 = tf.add_hash_col(employees)
        assert "sys_col_row_hash" in names(h1)
        # idempotent: second call returns unchanged plan
        assert names(tf.add_hash_col(h1)) == names(h1)
        a = sorted(r.sys_col_row_hash for r in h1.select("sys_col_row_hash").collect())
        b = sorted(r.sys_col_row_hash for r in tf.add_hash_col(employees).collect())
        assert a == b
        # hash must not be null even with null inputs in the row
        assert all(v is not None for v in a)

    def test_hash_ignores_sys_cols(self, employees):
        base = tf.add_hash_col(employees)
        with_sys = employees.withColumn("sys_col_junk", F.lit("x"))
        h2 = tf.add_hash_col(with_sys)
        a = sorted(r.sys_col_row_hash for r in base.select("sys_col_row_hash").collect())
        b = sorted(r.sys_col_row_hash for r in h2.select("sys_col_row_hash").collect())
        assert a == b

    def test_add_process_cols(self, employees):
        dt = datetime.datetime(2025, 10, 16, 12, tzinfo=datetime.timezone.utc)
        out = tf.add_process_cols(employees, dt, "g-1", "/src/x.parquet", "team_a")
        row = out.select(
            "sys_col_team_a_guid", "sys_col_team_a_src_path", "sys_col_team_a_datetime"
        ).first()
        assert row[0] == "g-1"
        assert row[1] == "/src/x.parquet"
        assert row[2] == datetime.datetime(2025, 10, 16, 12)  # session-TZ (UTC) naive

    def test_normalise_str_cols_strips_all_whitespace_and_lowers(self, spark):
        df = spark.createDataFrame([("  A\tB\n", "keep")], "s string, sys_col_x string")
        out = tf.normalise_str_cols(df).first()
        assert out.s == "a\tb"  # edge whitespace stripped, inner kept, lowered
        assert out.sys_col_x == "keep"  # sys cols untouched


class TestColumnOps:
    def test_drop_rename_noop_gates(self, employees):
        assert tf.drop_df_cols(employees, []) is employees
        assert tf.rename_df_cols(employees, {}) is employees
        assert names(tf.drop_df_cols(employees, ["bonus"])) == [
            "name", "age", "salary", "projects",
        ]
        assert "full_name" in names(tf.rename_df_cols(employees, {"name": "full_name"}))

    def test_recast(self, employees):
        out = tf.recast_df_cols(employees, {"salary": "Int64", "age": "Float64"})
        assert dict(out.dtypes)["salary"] == "bigint"
        assert dict(out.dtypes)["age"] == "double"

    @pytest.mark.parametrize("ansi", [True, False])
    def test_recast_failure_strictness_pinned(self, spark, ansi):
        """Reference parity for strict_cast (reference core/transform.py:
        155-164: Polars strict cast RAISES on an unparseable value).

        Spark gives the same contract through ``spark.sql.ansi.enabled``:
        ON (the Spark 4 default, what our pipelines run with) raises
        CAST_INVALID_INPUT like the reference; OFF degrades to null-on-
        failure — pinned here so a conf regression is caught."""
        from pyspark.errors import PySparkException

        df = spark.createDataFrame([("12",), ("not-a-number",)], "x string")
        prev = spark.conf.get("spark.sql.ansi.enabled")
        spark.conf.set("spark.sql.ansi.enabled", str(ansi).lower())
        try:
            out = tf.recast_df_cols(df, {"x": "Int64"})
            if ansi:
                with pytest.raises(PySparkException, match="CAST_INVALID_INPUT"):
                    out.collect()
            else:
                vals = {r.x for r in out.collect()}
                assert vals == {12, None}
        finally:
            spark.conf.set("spark.sql.ansi.enabled", prev)

    def test_fill_nulls_keeps_dtype(self, employees):
        out = tf.fill_nulls_per_col(employees, {"bonus": 0, "age": -1})
        assert dict(out.dtypes)["bonus"] == "double"  # int literal, double col
        vals = {r.name.strip().lower(): r.bonus for r in out.collect()}
        assert vals["bob"] == 0.0
        ages = {r.name.strip().lower(): r.age for r in out.collect()}
        assert ages["dave"] == -1

    def test_clip_preserves_null(self, employees):
        out = tf.clip_df_cols(employees, {"bonus": (2000, 6000)})
        vals = {r.name.strip().lower(): r.bonus for r in out.collect()}
        assert vals["bob"] is None  # null stays null (Polars parity)
        assert vals["alice"] == 5000.0
        assert vals["eve"] == 6000.0  # clipped down
        assert vals["dave"] == 2000.0  # clipped up

    def test_nest_unnest_roundtrip(self, employees):
        nested = tf.nest_df_cols(employees, {"pay": ["salary", "bonus"]})
        assert "salary" not in names(nested) and "pay" in names(nested)
        flat = tf.unnest_df_cols(nested, ["pay"])
        assert {"salary", "bonus"} <= set(names(flat))
        un = tf.unnest_df_cols(employees, ["projects"])
        assert {"a", "b"} <= set(names(un))

    def test_unnest_expands_in_place(self, employees):
        """Polars unnest (reference transform.py:216) expands struct fields
        at the struct's POSITION, not appended at the end (ADVICE r1)."""
        un = tf.unnest_df_cols(employees, ["projects"])
        # employees: name, age, salary, bonus, projects{a,b}
        assert names(un) == ["name", "age", "salary", "bonus", "a", "b"]

    def test_select_sys_cols_last(self, employees):
        df = tf.add_hash_col(employees).withColumn("zz", F.lit(1))
        out = tf.select_with_sys_cols_last(df, ["name", "salary"])
        assert names(out) == ["name", "salary", "sys_col_row_hash"]
        out_star = tf.select_with_sys_cols_last(df, "*")
        assert names(out_star)[-1] == "sys_col_row_hash"

    def test_standardise_col_names(self, spark):
        df = spark.createDataFrame([(1, 2)], "`Col A` int, ` other ` int")
        out = tf.standardise_col_names_if_no_case_insensitive_dupes(df)
        assert names(out) == ["col a", "other"]
        # collision → skipped
        df2 = spark.createDataFrame([(1, 2)], "`A` int, `a` int")
        assert names(tf.standardise_col_names_if_no_case_insensitive_dupes(df2)) == ["A", "a"]


class TestFilterDedupe:
    def test_filter(self, employees):
        from polars_pipe_spark.expressions import build_rule_expr

        out = tf.filter_df(
            employees,
            [build_rule_expr("salary", "gt", 45000), build_rule_expr("age", "is_not_null")],
        )
        assert {r.name for r in out.collect()} == {"  Alice ", "CHARLIE", "Eve"}

    def test_dedupe_all_and_subset(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "b"), (2, "c")], "k int, v string"
        )
        assert tf.deduplicate_rows(df, ["*"]).count() == 3
        assert tf.deduplicate_rows(df, ["k"]).count() == 2
        # order-stable variant keeps min(order_col)
        df2 = spark.createDataFrame(
            [(1, "z", 2), (1, "a", 1), (2, "c", 3)], "k int, v string, idx int"
        )
        kept = {r.k: r.v for r in tf.deduplicate_rows(df2, ["k"], order_col="idx").collect()}
        assert kept == {1: "a", 2: "c"}


class TestDerive:
    def test_arithmetic(self, employees):
        out = tf.derive_new_cols(
            employees,
            {
                "total": {"fn_name": "add_cols", "fn_kwargs": {"cols": ["salary", "bonus"]}},
                "ratio": {"fn_name": "div_cols", "fn_kwargs": {"cols": ["bonus", "salary"]}},
            },
        )
        vals = {r.name.strip().lower(): (r.total, r.ratio) for r in out.collect()}
        assert vals["alice"] == (55000.0, 0.1)
        assert vals["bob"] == (None, None)  # null propagates

    def test_agg_broadcast(self, employees):
        out = tf.derive_new_cols(
            employees, {"mean_salary": {"fn_name": "mean", "fn_kwargs": {"col": "salary"}}}
        )
        vals = [r.mean_salary for r in out.collect()]
        assert len(vals) == 5 and all(v == 52600.0 for v in vals)

    def test_scalar_registry(self, employees):
        out = tf.derive_new_cols(
            employees,
            {
                "name_len": {"fn_name": "len_chars", "fn_kwargs": {"col": "name"}},
                "log_salary": {"fn_name": "log", "fn_kwargs": {"col": "salary"}},
                "rounded": {"fn_name": "round", "fn_kwargs": {"col": "salary", "decimals": -3}},
            },
        )
        row = {r.name.strip().lower(): r for r in out.collect()}
        assert row["bob"].name_len == 3
        assert abs(row["bob"].log_salary - 10.645424897265443) < 1e-12
        assert row["bob"].rounded == 42000.0

    def test_agg_overwrites_existing_column(self, employees):
        """An aggregate derive whose name collides with an existing column
        OVERWRITES it in place, like the reference's with_columns (ADVICE
        r1: used to raise ambiguous-reference via the cross-join dup)."""
        out = tf.derive_new_cols(
            employees, {"salary": {"fn_name": "mean", "fn_kwargs": {"col": "salary"}}}
        )
        assert names(out) == names(employees)  # position kept, no dup
        assert all(r.salary == 52600.0 for r in out.collect())

    def test_cumulative_requires_order(self, spark):
        df = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "idx int, v double")
        out = tf.derive_new_cols(
            df, {"run": {"fn_name": "cum_sum", "fn_kwargs": {"col": "v", "order_by": "idx"}}}
        )
        assert [r.run for r in out.orderBy("idx").collect()] == [10.0, 30.0, 60.0]

    def test_empty_cols_raises(self):
        from polars_pipe_spark.expressions import add_cols

        with pytest.raises(ValueError, match="at least one column"):
            add_cols([])

    def test_unknown_fn_raises(self, employees):
        with pytest.raises(KeyError, match="unknown derive fn"):
            tf.derive_new_cols(employees, {"x": {"fn_name": "nope", "fn_kwargs": {}}})


class TestCustomTransforms:
    def test_pipe_custom(self, employees):
        def double_salary(df, factor=2):
            return df.withColumn("salary", F.col("salary") * factor)

        out = tf.pipe_custom_transformations(
            employees, {"double_salary": double_salary}, {"double_salary": {"factor": 3}}
        )
        assert out.first().salary == 150000.0

    def test_unknown_custom_raises(self, employees):
        with pytest.raises(KeyError):
            tf.pipe_custom_transformations(employees, {}, {"nope": {}})


class TestLineageGoldenValues:
    """Exact xxhash64 golden pins (the q12 docstring's claim): a Spark
    upgrade or a change to the canonical-key construction must trip
    these, not silently re-hash the lake."""

    def test_non_null_rows_pinned(self, spark):
        df = spark.createDataFrame(
            [("alice", 30, 1.5), ("bob", 25, 2.5)],
            "name string, age long, bonus double",
        )
        got = {
            r.name: r.sys_col_row_hash
            for r in tf.add_hash_col(df).collect()
        }
        assert got == {
            "alice": 6499047024113404441,
            "bob": 4666556867740427835,
        }

    def test_null_propagation_parity(self, spark):
        """Reference parity (SURVEY §1.3): the canonical key uses
        null-PROPAGATING concat, so any row containing a null hashes to
        the same sentinel (the reference's golden test pins the same
        collapse — charlie's null-bonus row equals the all-defaults error
        row). Deliberate fidelity, pinned so nobody 'fixes' it without
        noticing it is a contract."""
        df = spark.createDataFrame(
            [("alice", 30, None), ("bob", None, 5.5)],
            "name string, age long, bonus double",
        )
        vals = [r.sys_col_row_hash for r in tf.add_hash_col(df).collect()]
        assert vals[0] == vals[1] == -7444071767201028348
