"""Stage library: every stage is ``Callable[[DataFrame, ...], DataFrame]``
with the reference's no-op-on-empty-config gate, chained via
``DataFrame.transform`` (the Spark analogue of ``LazyFrame.pipe``).

Reference behavior being re-expressed (citations are reference file:line):
- lineage columns: src/polars_pipe/core/transform.py:51-96
- string normalisation: transform.py:99-109
- column-name standardisation: transform.py:112-128
- projection stages: transform.py:131-216
- filter/dedupe: transform.py:219-241
- derive stage: transform.py:251-293
- custom transformations: transform.py:296-329

Declared differences (SURVEY.md §7.4, deliberate for Spark scale):
- Row hash is ``xxhash64`` (signed 64-bit), not Polars' seahash. Null
  handling matches Polars ``concat_str``: any null column nulls the
  concatenation, and the hash of NULL input is defined as NULL → we map it
  to a sentinel hash of lit("") so the column stays non-null.
- ``deduplicate_rows`` is keep-any (``dropDuplicates``) by default; Spark
  has no implicit row order. Order-stable dedupe is available by passing
  ``order_col`` — it keeps the row with the minimum value of that column
  per key, via a partitioned window (scales: shuffle on the subset keys).
- Aggregate-derived columns broadcast via agg + broadcast join, not a
  global window (single-partition collapse at 100 TB).
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from polars_pipe_spark.expressions import (
    AGG_FNS,
    ALL_DERIVE_FNS,
    clip_expr,
    combine_filters,
    strip_whitespace,
)
from polars_pipe_spark.types import SYS_COL_PREFIX, resolve_dtype

HASH_COL = "sys_col_row_hash"


# ---------------------------------------------------------------------------
# Lineage / system columns (reference transform.py:51-109)
# ---------------------------------------------------------------------------


def row_hash_expr(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Deterministic row-hash expression over non-sys columns.

    Canonical form: nested (struct/array/map) columns JSON-encoded, scalars
    cast to string, joined with "|" null-propagatingly (``F.concat`` — any
    null input nulls the whole key, matching Polars ``concat_str``,
    reference transform.py:62-71), then xxhash64. A fully-null key hashes
    via the empty string so the column is total.
    """
    schema = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    cols = cols or [c for c in df.columns if not c.startswith(SYS_COL_PREFIX)]
    parts: list[Column] = []
    for i, c in enumerate(cols):
        enc = (
            F.to_json(F.col(c))
            if isinstance(schema[c], (T.StructType, T.ArrayType, T.MapType))
            else F.col(c).cast("string")
        )
        if i:
            parts.append(F.lit("|"))
        parts.append(enc)
    key = F.concat(*parts) if parts else F.lit("")
    return F.xxhash64(F.coalesce(key, F.lit("")))


def add_hash_col(df: DataFrame) -> DataFrame:
    """Add ``sys_col_row_hash``; idempotent — returns unchanged if present
    (reference transform.py:56-58). Cannot be skipped."""
    if HASH_COL in df.columns:
        return df
    return df.withColumn(HASH_COL, row_hash_expr(df))


def add_process_cols(
    df: DataFrame,
    date_time: datetime,
    guid: str,
    src_path: str,
    process_name: str = "process",
) -> DataFrame:
    """Add per-process lineage literals, namespaced by ``process_name`` so
    multiple teams' sys_cols don't clobber (reference transform.py:77-96)."""
    return df.withColumns(
        {
            f"sys_col_{process_name}_guid": F.lit(guid),
            f"sys_col_{process_name}_src_path": F.lit(src_path),
            f"sys_col_{process_name}_datetime": F.lit(date_time).cast("timestamp"),
        }
    )


def normalise_str_cols(df: DataFrame) -> DataFrame:
    """Strip all whitespace + lowercase every string column not starting
    with ``sys_col_`` (reference transform.py:99-109). Cannot be skipped."""
    targets = {
        f.name: F.lower(strip_whitespace(f.name))
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType) and not f.name.startswith("sys_col_")
    }
    return df.withColumns(targets) if targets else df


def standardise_col_names_if_no_case_insensitive_dupes(df: DataFrame) -> DataFrame:
    """Lowercase+strip column names unless that would collide
    (reference transform.py:112-128)."""
    lowered = [c.lower().strip() for c in df.columns]
    if len(lowered) != len(set(lowered)):
        return df
    renames = {c: s for c in df.columns if (s := c.lower().strip()) != c}
    return df.withColumnsRenamed(renames) if renames else df


# ---------------------------------------------------------------------------
# Projection / column stages (reference transform.py:131-216)
# ---------------------------------------------------------------------------


def drop_df_cols(df: DataFrame, drop_cols: list[str]) -> DataFrame:
    """Drop the listed columns (no-op on an empty list) — reference
    transform.py:147."""
    if not drop_cols:
        return df
    return df.drop(*drop_cols)


def rename_df_cols(df: DataFrame, rename_map: dict[str, str]) -> DataFrame:
    """Rename columns old → new per the config map — reference
    transform.py:151."""
    if not rename_map:
        return df
    return df.withColumnsRenamed(rename_map)


def recast_df_cols(df: DataFrame, recast_map: dict[str, Any]) -> DataFrame:
    """Cast columns to config-named dtypes. Spark cast is non-strict (null
    on failure) vs Polars strict_cast; enable ``spark.sql.ansi.enabled``
    for strict parity (SURVEY.md §4.2)."""
    if not recast_map:
        return df
    return df.withColumns(
        {c: F.col(c).cast(resolve_dtype(t)) for c, t in recast_map.items()}
    )


def fill_nulls_per_col(df: DataFrame, fill_map: dict[str, Any]) -> DataFrame:
    """Per-column null fill. ``coalesce`` keeps the column's type when the
    literal is coercible (Polars fill_null(0) on Float64 stays Float64 —
    reference test golden, tests/services/test_basic_pipeline.py:185)."""
    if not fill_map:
        return df
    return df.withColumns(
        {c: F.coalesce(F.col(c), F.lit(v).cast(df.schema[c].dataType)) for c, v in fill_map.items()}
    )


def clip_df_cols(df: DataFrame, clip_map: dict[str, tuple[Any, Any]]) -> DataFrame:
    """Null-preserving clamp to (min, max) per column (reference
    transform.py:179-190; null semantics SURVEY.md §1.3)."""
    if not clip_map:
        return df
    return df.withColumns(
        {c: clip_expr(c, lo, hi) for c, (lo, hi) in clip_map.items()}
    )


def nest_df_cols(df: DataFrame, nest_cols: dict[str, list[str]]) -> DataFrame:
    """Pack listed columns into a struct column, dropping the originals
    (reference transform.py:193-204)."""
    if not nest_cols:
        return df
    df = df.withColumns(
        {name: F.struct(*[F.col(c) for c in cols]) for name, cols in nest_cols.items()}
    )
    return df.drop(*[c for cols in nest_cols.values() for c in cols])


def unnest_df_cols(df: DataFrame, unnest_cols: list[str]) -> DataFrame:
    """Expand struct columns into their fields in place (reference
    transform.py:207-216; collision-unsafe like the original)."""
    if not unnest_cols:
        return df
    for c in unnest_cols:
        fields = [f.name for f in df.schema[c].dataType.fields]
        select: list[Column] = []
        for o in df.columns:
            if o == c:  # expand at the struct's position, like Polars unnest
                select.extend(F.col(f"{c}.{f}").alias(f) for f in fields)
            else:
                select.append(F.col(o))
        df = df.select(*select)
    return df


def select_with_sys_cols_last(df: DataFrame, select_cols: list[str] | str = "*") -> DataFrame:
    """Select the requested columns (all for "*") then append every sys_col
    in original relative order (reference basic_pipeline.py:70-75)."""
    user = [
        c
        for c in df.columns
        if (select_cols == "*" or c in select_cols) and not c.startswith(SYS_COL_PREFIX)
    ]
    sys = [c for c in df.columns if c.startswith(SYS_COL_PREFIX)]
    return df.select(*user, *sys)


# ---------------------------------------------------------------------------
# Filter / dedupe (reference transform.py:219-241)
# ---------------------------------------------------------------------------


def filter_df(df: DataFrame, filter_exprs: list[Column]) -> DataFrame:
    """Keep rows passing ALL parsed rule expressions (AND-combined into
    one predicate so Catalyst pushes a single filter to the scan) —
    reference transform.py:194."""
    if not filter_exprs:
        return df
    return df.filter(combine_filters(filter_exprs))


def deduplicate_rows(
    df: DataFrame, subset_cols: list[str], order_col: str | None = None
) -> DataFrame:
    """Deduplicate on a subset of columns; ``["*"]`` means all columns
    (reference transform.py:232-241 uses keep-any + maintain_order).

    Spark semantics: keep-any via ``dropDuplicates`` (one shuffle on the
    subset key, map-side partial dedupe — the scalable default). Pass
    ``order_col`` for deterministic keep-first by that column (partitioned
    window; same single shuffle)."""
    if not subset_cols:
        return df
    subset = df.columns if subset_cols == ["*"] else subset_cols
    if order_col is None:
        return df.dropDuplicates(subset)
    w = Window.partitionBy(*subset).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__pps_rn", F.row_number().over(w))
        .filter(F.col("__pps_rn") == 1)
        .drop("__pps_rn")
    )


# ---------------------------------------------------------------------------
# Derive stage (reference transform.py:251-293)
# ---------------------------------------------------------------------------


def derive_new_cols(df: DataFrame, new_col_map: dict[str, dict[str, Any]]) -> DataFrame:
    """Derive new columns from config:
    ``{"new_col": {"fn_name": "...", "fn_kwargs": {...}}}``.

    Scalar/cumulative/custom fns come from the documented registry
    (expressions.ALL_DERIVE_FNS). Aggregate fn_names (mean, sum, …) follow
    Polars broadcast semantics — the whole-column aggregate attached to
    every row (reference golden tests/services/test_basic_pipeline.py:85)
    — compiled as one scalar agg + broadcast cross-join per derive stage,
    which stays distributed at any scale (SURVEY.md §2.5 C5).
    """
    if not new_col_map:
        return df

    scalar_exprs: dict[str, Column] = {}
    agg_names: list[str] = []
    agg_exprs: list[Column] = []
    for name, fn_config in new_col_map.items():
        fn_name = fn_config["fn_name"]
        kwargs = dict(fn_config.get("fn_kwargs", {}))
        if fn_name in AGG_FNS:
            # Temp alias: a name colliding with an existing column would
            # otherwise become a duplicate via the cross-join and make the
            # final select ambiguous; with_columns in the reference
            # OVERWRITES in place — withColumn below does the same.
            agg_names.append(name)
            agg_exprs.append(AGG_FNS[fn_name](**kwargs).alias(f"__agg_{name}"))
        elif fn_name in ALL_DERIVE_FNS:
            scalar_exprs[name] = ALL_DERIVE_FNS[fn_name](**kwargs)
        else:
            raise KeyError(
                f"unknown derive fn {fn_name!r}; supported: "
                f"{sorted(set(ALL_DERIVE_FNS) | set(AGG_FNS))}"
            )

    base_cols = list(df.columns)
    if agg_exprs:
        # One-row side → BroadcastNestedLoopJoin; safe and fully parallel.
        df = df.crossJoin(F.broadcast(df.agg(*agg_exprs)))
        df = df.withColumns(
            {name: F.col(f"__agg_{name}") for name in agg_names}
        ).drop(*[f"__agg_{name}" for name in agg_names])
    if scalar_exprs:
        df = df.withColumns(scalar_exprs)
    # New columns appear in config insertion order after the existing ones
    # (the reference's single with_columns gives this for free).
    return df.select(*base_cols, *[c for c in new_col_map if c not in base_cols])


# ---------------------------------------------------------------------------
# Custom transformations (reference transform.py:296-329)
# ---------------------------------------------------------------------------


def pipe_custom_transformations(
    df: DataFrame,
    custom_transformation_fns: dict[str, Callable[..., DataFrame]],
    custom_transformation_map: dict[str, dict[str, Any]],
) -> DataFrame:
    """Apply user-registered ``DataFrame -> DataFrame`` functions by name,
    sequentially, with config kwargs. KeyError on unknown name (same error
    contract as reference transform.py:327)."""
    if not custom_transformation_map:
        return df
    for fn_name, kwargs in custom_transformation_map.items():
        func = custom_transformation_fns[fn_name]
        df = df.transform(func, **kwargs)
    return df
