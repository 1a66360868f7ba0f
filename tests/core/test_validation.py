"""Validation tests (model: reference tests/core/test_validation.py —
contract checks incl. error paths, plus split semantics)."""

from __future__ import annotations

import pytest

from polars_pipe_spark.operators import validation as vl


class TestExpectedCols:
    def test_extract_accounts_for_renames_and_derived(self):
        transformations = {
            "rename_map": {"old_name": "new_name"},
            "fill_map": {"bonus": 0},
            "clip_map": {"new_name": (0, 1)},  # renamed → maps back to old_name
            "new_col_map": {"derived": {"fn_name": "add_cols", "fn_kwargs": {}}},
            "drop_cols": ["derived"],  # derived col → excluded
            "nest_cols": {"s": ["a", "b"]},
            "filter_exprs": {"r1": ["age", "gt", 0]},
        }
        validation = {"v1": ["salary", "is_not_null", None]}
        got = vl.extract_expected_cols(transformations, validation)
        assert got == {"old_name", "bonus", "a", "b", "age", "salary"}

    def test_check_passes_and_raises(self, employees):
        assert vl.check_expected_cols(employees, ["name", "age"]) is employees
        with pytest.raises(ValueError, match="missing"):
            vl.check_expected_cols(employees, ["name", "ghost"])


class TestValidateSplit:
    def test_split_and_error_reasons(self, employees):
        rules = vl.parse_validation_config(
            {
                "age present": ["age", "is_not_null", None],
                "salary above 45k": ["salary", "gt", 45000],
            }
        )
        valid, invalid = vl.validate_df(employees, rules)
        assert {r.name for r in valid.collect()} == {"  Alice ", "CHARLIE", "Eve"}
        reasons = {r.name: r.error_reason for r in invalid.collect()}
        assert reasons["Bob"] == "salary above 45k"
        assert reasons["dave"] == "age present"
        assert "error_reason" not in valid.columns

    def test_null_outcome_is_pass(self, spark):
        """Reference parity (ADVICE r1): a null rule outcome does NOT
        fire the fail branch — ``pl.when(~expr)`` on null keeps the row
        valid; catching nulls needs an explicit is_not_null rule."""
        df = spark.createDataFrame([(None,), (5,), (1,)], "x int")
        rules = vl.parse_validation_config({"x gt 3": ["x", "gt", 3]})
        valid, invalid = vl.validate_df(df, rules)
        assert valid.count() == 2  # 5 passes, null passes
        assert invalid.first().error_reason == "x gt 3"  # only x=1 fails

    def test_multiple_failures_joined(self, spark):
        df = spark.createDataFrame([(None, -1)], "x int, y int")
        rules = vl.parse_validation_config(
            {"x ok": ["x", "is_not_null", None], "y pos": ["y", "gt", 0]}
        )
        _, invalid = vl.validate_df(df, rules)
        assert invalid.first().error_reason == "x ok,y pos"

    def test_empty_rules_fast_path(self, employees):
        valid, invalid = vl.validate_df(employees, {})
        assert valid is employees
        assert invalid.count() == 0
        assert invalid.schema == employees.schema


class TestRuleCompiler:
    @pytest.mark.parametrize(
        ("spec", "expected_names"),
        [
            (["salary", "gt", 50000], {"CHARLIE", "Eve"}),
            (["salary", "ge", 50000], {"  Alice ", "CHARLIE", "Eve"}),
            (["salary", "lt", 45000], {"Bob"}),
            (["salary", "ne", 42000.0], {"  Alice ", "CHARLIE", "dave", "Eve"}),
            (["age", "is_null", None], {"dave"}),
            (["age", "is_between", [30, 36]], {"  Alice ", "CHARLIE"}),
            (["name", "is_in", ["Bob", "Eve"]], {"Bob", "Eve"}),
            (["name", "str.contains", "^[A-Z]+$"], {"CHARLIE"}),
            (["name", "starts_with", "B"], {"Bob"}),
        ],
    )
    def test_rules(self, employees, spec, expected_names):
        from polars_pipe_spark.expressions import build_rule_expr

        got = {r.name for r in employees.filter(build_rule_expr(*spec)).collect()}
        assert got == expected_names

    def test_unknown_method_raises(self):
        from polars_pipe_spark.expressions import build_rule_expr

        with pytest.raises(KeyError, match="unknown rule method"):
            build_rule_expr("x", "definitely_not_a_method", 1)


class TestTableExpectations:
    def test_all_checks_and_violation_counts(self, spark):
        from polars_pipe_spark.operators.validation import table_expectations

        df = spark.createDataFrame(
            [(1, 1, "x"), (1, 1, "dup"), (2, 1, None), (3, 9, "y")],
            "k long, ref long, v string",
        )
        ref = spark.createDataFrame([(1,), (2,)], "r long")
        out = {r.expectation: (r.violations, r.passed) for r in table_expectations(
            df,
            unique_key=["k", "ref"],
            foreign_keys=[(["ref"], ref, ["r"])],
            non_null=["v"],
            min_rows=10,
        ).collect()}
        assert out["unique(k, ref)"] == (1, False)      # one extra (1,1) row
        assert out["fk(ref -> r)"] == (1, False)        # ref=9 orphan
        assert out["non_null(v)"] == (1, False)         # one null v
        assert out["min_rows(10)"] == (6, False)        # 4 rows, 6 short

    def test_clean_table_passes(self, spark):
        from polars_pipe_spark.operators.validation import table_expectations

        df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        out = table_expectations(df, unique_key=["k"], non_null=["v"], min_rows=1)
        assert all(r.passed and r.violations == 0 for r in out.collect())

    def test_empty_expectations_raise(self, spark):
        import pytest as _pytest

        from polars_pipe_spark.operators.validation import table_expectations

        df = spark.createDataFrame([(1,)], "k long")
        with _pytest.raises(ValueError, match="no expectations"):
            table_expectations(df)
