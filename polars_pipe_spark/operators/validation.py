"""Validation: column contract, config static analysis, rule-based
valid/invalid split.

Reference behavior (citations are reference file:line):
- ``extract_expected_cols``: static analysis over the config collecting
  every referenced column, inverting rename_map, excluding derived
  new_col_map names (src/polars_pipe/core/validation.py:12-72). This is
  engine-agnostic driver Python — re-expressed with the same contract.
- ``check_expected_cols``: driver-side schema assert raising ValueError
  listing missing columns (validation.py:75-86). On Spark this is free —
  ``df.columns`` is metadata, no job.
- ``validate_df``: build ``error_reason`` as the comma-joined names of
  failed rules, split into (valid, invalid) (validation.py:119-148).

Declared semantics for error_reason: the reference concat's ""-or-name
with "," separators then strips edge commas, leaving interior empty slots
("a,,c"). We declare the cleaner form — only failed rule names joined by
"," ("a,c") — via a null-filtered array join. Goldens regenerate.

Scale note: the valid/invalid split makes the tagged frame the input of
two downstream plans. ``run_pipeline`` persists it so the source is
scanned once, not once per branch (SURVEY.md §3.4).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_pipe_spark.expressions import parse_rules_config

ERROR_COL = "error_reason"

parse_validation_config = parse_rules_config  # reference-facing alias


def extract_expected_cols(
    transformations: dict[str, Any], validation: dict[str, list] | None = None
) -> set[str]:
    """Collect every column the config references, mapped back through
    rename_map to original names, excluding derived columns.

    Accepts the raw transformations dict + validation rules dict (the
    reference takes the parsed GeneralConfig; same information).
    """
    reverse_rename = {new: old for old, new in transformations.get("rename_map", {}).items()}
    new_cols = set(transformations.get("new_col_map", {}))

    def orig(name: str) -> str:
        return reverse_rename.get(name, name)

    expected: set[str] = set()

    # Stages whose config keys/items are column names.
    for stage in ("fill_map", "recast_map", "rename_map", "clip_map", "unnest_cols", "drop_cols"):
        for item in transformations.get(stage, ()) or ():
            if item not in new_cols:
                expected.add(orig(item))

    # nest_cols: values are lists of column names.
    for cols in (transformations.get("nest_cols", {}) or {}).values():
        for item in cols:
            if item not in new_cols:
                expected.add(orig(item))

    # Rule-shaped configs: [col, method, value] lists.
    for rules in (transformations.get("filter_exprs", {}) or {}, validation or {}):
        for spec in rules.values():
            if spec and spec[0] not in new_cols:
                expected.add(orig(spec[0]))

    return expected


def check_expected_cols(df: DataFrame, expected_cols: Any) -> DataFrame:
    """Raise ValueError listing missing columns (reference validation.py:75-86)."""
    actual = df.columns
    missing = [c for c in expected_cols if c not in actual]
    if missing:
        raise ValueError(f"Missing required columns: {missing = } {actual = }")
    return df


def error_reason_expr(rules: dict[str, Column]) -> Column:
    """Comma-joined names of failed rules; "" when all pass.

    A rule with a NULL outcome (e.g. ``col > 5`` on null) is a PASS —
    reference parity: ``pl.when(~expr).then(name).otherwise("")``
    (validation.py:131-137) doesn't fire the fail branch when ``~expr``
    is null, so null-conditioned rows stay in the valid table. Rules that
    should catch nulls must say so explicitly (``is_not_null``).
    """
    slots = [
        F.when(~expr, F.lit(name)).otherwise(F.lit(None).cast("string"))
        for name, expr in rules.items()
    ]
    return F.concat_ws(",", F.filter(F.array(*slots), lambda x: x.isNotNull()))


def tag_error_reason(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Append ``error_reason`` — the single tagged frame both split
    branches derive from (persist THIS, not the branches, so the scan +
    hash + tag prefix materialises once — SURVEY.md §3.4 point (a))."""
    return df.withColumn(ERROR_COL, error_reason_expr(rules))


def split_tagged(tagged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid-without-error_reason, invalid-with-error_reason) filters
    over one tagged frame."""
    valid = tagged.filter(F.col(ERROR_COL) == "").drop(ERROR_COL)
    invalid = tagged.filter(F.col(ERROR_COL) != "")
    return valid, invalid


def validate_df(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, invalid-with-error_reason). Empty rules →
    ``(df, empty df)`` fast path (reference validation.py:127-129)."""
    if not rules:
        empty = df.sparkSession.createDataFrame([], df.schema)
        return df, empty
    return split_tagged(tag_error_reason(df, rules))
