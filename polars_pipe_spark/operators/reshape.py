"""Reshape operators: pivot (long→wide) and unpivot/melt (wide→long).

Spark-native extension surface (no reference implementation — SURVEY.md
§2.9). Pivot with EXPLICIT values avoids the extra distinct-values job
Spark otherwise runs (a full scan at 100 TB); unpivot compiles to
``stack`` — a generate node, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_table(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    pivot_values: list[str],
    agg: Column,
    rename: dict[str, str] | None = None,
    fill_value=None,
) -> DataFrame:
    """GroupBy-pivot with explicit pivot values (required: implicit value
    discovery costs a full distinct scan before the real job)."""
    out = df.groupBy(*group_cols).pivot(pivot_col, pivot_values).agg(agg)
    if rename:
        out = out.withColumnsRenamed(rename)
    if fill_value is not None:
        value_cols = [rename.get(v, v) if rename else v for v in pivot_values]
        out = out.na.fill(fill_value, value_cols)
    return out


def unpivot(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str] | dict[str, str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Melt wide columns to (id…, variable, value) rows via ``stack`` —
    pure generate, no shuffle; values are cast to a common double type.
    ``value_cols`` may be a dict {column: label} to control the variable
    labels (default: the column name)."""
    labels = value_cols if isinstance(value_cols, dict) else {c: c for c in value_cols}
    pairs = ", ".join(f"'{label}', CAST(`{c}` AS DOUBLE)" for c, label in labels.items())
    return df.selectExpr(
        *[f"`{c}`" for c in id_cols],
        f"stack({len(labels)}, {pairs}) AS ({var_name}, {value_name})",
    )
