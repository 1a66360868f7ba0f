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


def table_expectations(
    df: DataFrame,
    unique_key: list[str] | None = None,
    foreign_keys: list[tuple[list[str], DataFrame, list[str]]] | None = None,
    non_null: list[str] | None = None,
    min_rows: int | None = None,
) -> DataFrame:
    """TABLE-level data-quality expectations (the dbt-test surface), as a
    complement to the row-level ``validate_df`` split: uniqueness of a
    key, foreign-key containment, column null-freedom, and a row-count
    floor — one report row per expectation with its violation count.

    Scale shapes: uniqueness is a two-level aggregate (groupBy key →
    1-row summary; no countDistinct Expand); each FK check is a
    left-anti join counted (broadcast the dimension side when small);
    null checks share ONE aggregation pass. Everything reduces to 1-row
    frames unioned driver-free.

    Output: (expectation string, violations long, passed boolean).
    """
    reports: list[DataFrame] = []
    if unique_key:
        per_key = df.groupBy(*unique_key).agg(F.count(F.lit(1)).alias("c"))
        summary = per_key.agg(
            (F.sum("c") - F.count(F.lit(1))).alias("extra_rows")
        )
        reports.append(
            summary.select(
                F.lit(f"unique({', '.join(unique_key)})").alias("expectation"),
                F.col("extra_rows").cast("long").alias("violations"),
                (F.col("extra_rows") == 0).alias("passed"),
            )
        )
    for cols, ref_df, ref_cols in foreign_keys or []:
        orphans = df.select(*cols).join(
            ref_df.select(
                *[F.col(rc).alias(c) for c, rc in zip(cols, ref_cols)]
            ).distinct(),
            on=list(cols),
            how="left_anti",
        )
        name = f"fk({', '.join(cols)} -> {', '.join(ref_cols)})"
        reports.append(
            orphans.agg(F.count(F.lit(1)).alias("v")).select(
                F.lit(name).alias("expectation"),
                F.col("v").cast("long").alias("violations"),
                (F.col("v") == 0).alias("passed"),
            )
        )
    if non_null:
        # one aggregation pass for ALL null checks; the per-column report
        # rows explode the single result row (no per-column re-scan)
        nulls = df.agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
                ).alias(f"__n_{i}")
                for i, c in enumerate(non_null)
            ]
        )
        slots = F.array(
            *[
                F.struct(
                    F.lit(f"non_null({c})").alias("expectation"),
                    F.col(f"__n_{i}").cast("long").alias("violations"),
                )
                for i, c in enumerate(non_null)
            ]
        )
        reports.append(
            nulls.select(F.explode(slots).alias("t")).select(
                "t.expectation",
                "t.violations",
                (F.col("t.violations") == 0).alias("passed"),
            )
        )
    if min_rows is not None:
        reports.append(
            df.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit(f"min_rows({min_rows})").alias("expectation"),
                F.greatest(F.lit(min_rows) - F.col("n"), F.lit(0))
                .cast("long")
                .alias("violations"),
                (F.col("n") >= min_rows).alias("passed"),
            )
        )
    if not reports:
        raise ValueError("table_expectations: no expectations given")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
