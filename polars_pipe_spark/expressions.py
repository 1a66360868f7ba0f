"""Expression compiler: config strings → ``pyspark.sql.Column``.

Covers two reference surfaces:

1. **Rule lists** ``["col", "method", value|None]`` used by validation and
   filters (reference: src/polars_pipe/core/validation.py:89-116, used for
   ``filter_exprs`` at src/polars_pipe/core/transform.py:42-44). The
   reference resolves ``method`` reflectively against ``pl.col(col)``; we
   resolve against a curated alias table of Polars-method-name →
   Column-operation, with a ``getattr(Column, method)`` fallback, so
   reference configs (``gt``, ``ne``, ``is_not_null``, ``is_in`` …) work
   unchanged.

2. **Derive registry** used by ``derive_new_cols`` (reference:
   src/polars_pipe/core/derive_cols.py:11-51 builds wrappers for every
   ``pl.Expr`` method reflectively, excluding ``map_batches``/``apply``).
   Blind reflection doesn't transfer — Spark splits expression methods
   between ``Column`` and ``pyspark.sql.functions`` — so we publish a
   curated, documented registry instead (SURVEY.md §7.4.6). Aggregates
   compile to scalar-agg + broadcast join (NOT a global window — that would
   collapse to one partition at 100 TB); cumulatives compile over an
   explicit ordered window.

No Python row UDFs anywhere here — everything stays JVM-side for
whole-stage codegen.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_pipe_spark.types import resolve_dtype

# ---------------------------------------------------------------------------
# 1. Rule lists → boolean Column (validation + filter surface)
# ---------------------------------------------------------------------------

# Polars pl.Expr method name → builder(Column, value) -> Column.
# Rules describe what a VALID record looks like (reference docstring,
# validation.py:101).
_RULE_OPS: dict[str, Callable[[Column, Any], Column]] = {
    "gt": lambda c, v: c > v,
    "ge": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "le": lambda c, v: c <= v,
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
    "is_null": lambda c, v: c.isNull(),
    "is_not_null": lambda c, v: c.isNotNull(),
    "is_nan": lambda c, v: F.isnan(c),
    "is_not_nan": lambda c, v: ~F.isnan(c),
    "is_in": lambda c, v: c.isin(*v) if isinstance(v, (list, tuple)) else c.isin(v),
    "is_between": lambda c, v: c.between(v[0], v[1]),
    "is_finite": lambda c, v: ~F.isnan(c) & c.isNotNull(),
    "is_duplicated": lambda c, v: F.count("*").over(Window.partitionBy(c)) > 1,
    "is_unique": lambda c, v: F.count("*").over(Window.partitionBy(c)) == 1,
    # string predicates (Polars str.* namespace, flattened names accepted)
    "str.contains": lambda c, v: c.rlike(v),
    "contains": lambda c, v: c.contains(v),
    "str.starts_with": lambda c, v: c.startswith(v),
    "starts_with": lambda c, v: c.startswith(v),
    "str.ends_with": lambda c, v: c.endswith(v),
    "ends_with": lambda c, v: c.endswith(v),
}


def build_rule_expr(col_name: str, method: str, value: Any = None) -> Column:
    """Compile one ``[col, method, value]`` rule to a boolean Column."""
    col = F.col(col_name)
    key = method.strip()
    if key in _RULE_OPS:
        return _RULE_OPS[key](col, value)
    # Fallback: any real Column method (e.g. "between", "like", "rlike").
    attr = getattr(col, key, None)
    if callable(attr):
        return attr() if value is None else attr(value)
    raise KeyError(
        f"unknown rule method {method!r}; supported: {sorted(_RULE_OPS)} "
        "or any pyspark Column method"
    )


def parse_rules_config(rules_config: dict[str, list[Any]]) -> dict[str, Column]:
    """``{"rule name": [col, method, value|None]}`` → ``{rule name: Column}``.

    Same config shape as the reference's ``parse_validation_config``
    (src/polars_pipe/core/validation.py:89-116).
    """
    return {
        name: build_rule_expr(*spec) if len(spec) == 3 else build_rule_expr(spec[0], spec[1])
        for name, spec in rules_config.items()
    }


def combine_filters(exprs: list[Column]) -> Column:
    """AND-combine (reference uses ``pl.all_horizontal``, transform.py:228)."""
    return functools.reduce(operator.and_, exprs)


# ---------------------------------------------------------------------------
# 2. Derive registry (config-named column functions)
# ---------------------------------------------------------------------------


def _reduce_horizontal(op: Callable, cols: list[str]) -> Column:
    """Left-fold a binary op over columns; raises on empty — same error
    contract as the reference (derive_cols.py:11-17)."""
    if not cols:
        raise ValueError(f"Must supply at least one column. {op = } {cols = }")
    return functools.reduce(op, [F.col(c) for c in cols])


def add_cols(cols: list[str]) -> Column:
    return _reduce_horizontal(operator.add, cols)


def sub_cols(cols: list[str]) -> Column:
    return _reduce_horizontal(operator.sub, cols)


def mul_cols(cols: list[str]) -> Column:
    return _reduce_horizontal(operator.mul, cols)


def div_cols(cols: list[str]) -> Column:
    return _reduce_horizontal(operator.truediv, cols)


# --- scalar functions: Polars Expr method name → Column builder -------------
# fn(col, *args, **kwargs) -> Column, mirroring the reference's dynamically
# generated wrappers (derive_cols.py:43-44) with explicit, documented names.


def _col_method(method: str) -> Callable[..., Column]:
    def fn(col: str, *args: Any, **kwargs: Any) -> Column:
        return getattr(F.col(col), method)(*args, **kwargs)

    fn.__doc__ = f"Column.{method} on the named column"
    return fn


def _f_func(func: Callable[..., Column]) -> Callable[..., Column]:
    def fn(col: str, *args: Any, **kwargs: Any) -> Column:
        return func(F.col(col), *args, **kwargs)

    fn.__doc__ = f"F.{func.__name__} on the named column"
    return fn


SCALAR_FNS: dict[str, Callable[..., Column]] = {
    # math
    "abs": _f_func(F.abs),
    "round": lambda col, decimals=0: F.round(F.col(col), decimals),
    "floor": _f_func(F.floor),
    "ceil": _f_func(F.ceil),
    "sqrt": _f_func(F.sqrt),
    "cbrt": _f_func(F.cbrt),
    "exp": _f_func(F.exp),
    "log": lambda col, base=None: F.log(F.col(col)) if base is None else F.log(base, F.col(col)),
    "log10": _f_func(F.log10),
    "log1p": _f_func(F.log1p),
    "pow": lambda col, exponent: F.pow(F.col(col), exponent),
    "sin": _f_func(F.sin),
    "cos": _f_func(F.cos),
    "tan": _f_func(F.tan),
    "arcsin": _f_func(F.asin),
    "arccos": _f_func(F.acos),
    "arctan": _f_func(F.atan),
    "sinh": _f_func(F.sinh),
    "cosh": _f_func(F.cosh),
    "tanh": _f_func(F.tanh),
    "sign": _f_func(F.signum),
    "neg": lambda col: -F.col(col),
    "degrees": _f_func(F.degrees),
    "radians": _f_func(F.radians),
    "clip": lambda col, lower_bound=None, upper_bound=None: clip_expr(
        col, lower_bound, upper_bound
    ),
    # null / nan handling
    "fill_null": lambda col, value: F.coalesce(F.col(col), F.lit(value)),
    "fill_nan": lambda col, value: F.when(F.isnan(col), F.lit(value)).otherwise(F.col(col)),
    "is_null": _col_method("isNull"),
    "is_not_null": _col_method("isNotNull"),
    "is_nan": _f_func(F.isnan),
    # casting
    "cast": lambda col, dtype: F.col(col).cast(resolve_dtype(dtype)),
    # strings (Polars str.* namespace, flattened)
    "lower": _f_func(F.lower),
    "to_lowercase": _f_func(F.lower),
    "upper": _f_func(F.upper),
    "to_uppercase": _f_func(F.upper),
    "strip_chars": lambda col: strip_whitespace(col),
    "len_chars": _f_func(F.length),
    "str_len": _f_func(F.length),
    "reverse": _f_func(F.reverse),
    "slice": lambda col, offset, length=None: F.col(col).substr(
        offset + 1, length if length is not None else 2**31 - 1
    ),
    "replace": lambda col, pattern, value: F.regexp_replace(F.col(col), pattern, value),
    "replace_all": lambda col, pattern, value: F.regexp_replace(F.col(col), pattern, value),
    "contains_str": lambda col, pattern: F.col(col).rlike(pattern),
    "starts_with": lambda col, prefix: F.col(col).startswith(prefix),
    "ends_with": lambda col, suffix: F.col(col).endswith(suffix),
    "pad_start": lambda col, length, fill_char=" ": F.lpad(F.col(col), length, fill_char),
    "pad_end": lambda col, length, fill_char=" ": F.rpad(F.col(col), length, fill_char),
    "zfill": lambda col, length: F.lpad(F.col(col), length, "0"),
    "split": lambda col, by: F.split(F.col(col), by),
    "concat_str_lit": lambda col, value: F.concat(F.col(col), F.lit(value)),
    # dates / datetimes (Polars dt.* namespace, flattened)
    "year": _f_func(F.year),
    "month": _f_func(F.month),
    "day": _f_func(F.dayofmonth),
    "ordinal_day": _f_func(F.dayofyear),
    "weekday": _f_func(F.dayofweek),
    "week": _f_func(F.weekofyear),
    "quarter": _f_func(F.quarter),
    "hour": _f_func(F.hour),
    "minute": _f_func(F.minute),
    "second": _f_func(F.second),
    "date": _f_func(F.to_date),
    "to_date": lambda col, fmt=None: F.to_date(F.col(col), fmt),
    "to_datetime": lambda col, fmt=None: F.to_timestamp(F.col(col), fmt),
    "truncate": lambda col, every: F.date_trunc(_polars_interval_to_spark(every), F.col(col)),
    # arrays (Polars list.* namespace, flattened)
    "list_len": _f_func(F.size),
    "list_sum": lambda col: F.aggregate(
        F.col(col), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    ),
    "list_min": _f_func(F.array_min),
    "list_max": _f_func(F.array_max),
    "list_sort": _f_func(F.array_sort),
    "list_unique": _f_func(F.array_distinct),
    "list_contains": lambda col, item: F.array_contains(F.col(col), item),
    "list_join": lambda col, separator: F.array_join(F.col(col), separator),
    # misc
    "hash": lambda col: F.xxhash64(F.col(col)),
    "md5_hex": _f_func(F.md5),
    "shrink_dtype": lambda col: F.col(col),  # no-op: Spark types are fixed
    "not": lambda col: ~F.col(col),
    # additional Polars Expr surface (flattened names)
    "mod": lambda col, other: F.col(col) % other,
    "floordiv": lambda col, other: F.floor(F.col(col) / other).cast("long"),
    "clip_min": lambda col, lower_bound: clip_expr(col, lower_bound, None),
    "clip_max": lambda col, upper_bound: clip_expr(col, None, upper_bound),
    "is_finite": lambda col: ~F.isnan(col) & F.col(col).isNotNull()
    & (F.abs(F.col(col)) != float("inf")),
    "is_infinite": lambda col: F.abs(F.col(col)) == float("inf"),
    "exp_m1": _f_func(F.expm1),
    "arctanh": _f_func(F.atanh),
    "arcsinh": _f_func(F.asinh),
    "arccosh": _f_func(F.acosh),
    "to_titlecase": _f_func(F.initcap),
    "len_bytes": _f_func(F.octet_length),
    "strip_chars_start": lambda col: F.regexp_replace(F.col(col), r"^\s+", ""),
    "strip_chars_end": lambda col: F.regexp_replace(F.col(col), r"\s+$", ""),
    "str_head": lambda col, n: F.col(col).substr(1, n),
    "str_tail": lambda col, n: F.substring(F.col(col), -n, n),
    "extract": lambda col, pattern, group_index=1: F.regexp_extract(
        F.col(col), pattern, group_index
    ),
    "count_matches": lambda col, pattern: F.size(
        F.regexp_extract_all(F.col(col), F.lit(pattern), 0)
    ),
    "encode_base64": _f_func(F.base64),
    "decode_base64": _f_func(F.unbase64),
    "repeat_str": lambda col, n: F.repeat(F.col(col), n),
    "epoch_seconds": lambda col: F.unix_timestamp(F.col(col)),
    "millisecond": lambda col: (F.unix_micros(F.col(col)) % 1_000_000 / 1000).cast("int"),
    "days_in_month": lambda col: F.dayofmonth(F.last_day(F.col(col))),
    "month_start": lambda col: F.date_trunc("month", F.col(col)).cast("date"),
    "month_end": _f_func(F.last_day),
    "add_days": lambda col, n: F.date_add(F.col(col), n),
    "list_first": lambda col: F.get(F.col(col), 0),
    "list_last": lambda col: F.element_at(F.col(col), -1),
    "list_reverse": _f_func(F.reverse),
    "list_slice": lambda col, offset, length: F.slice(F.col(col), offset + 1, length),
    "list_get": lambda col, index: F.get(F.col(col), index),
    "struct_field": lambda col, name: F.col(col).getField(name),
    "when_then_otherwise": lambda col, value, other: F.when(
        F.col(col), F.lit(value)
    ).otherwise(F.lit(other)),
    "least_of": lambda col, other: F.least(F.col(col), F.lit(other)),
    "greatest_of": lambda col, other: F.greatest(F.col(col), F.lit(other)),
}

# --- aggregate functions, attached as broadcast columns ---------------------
# Polars semantics: `pl.col("salary").mean()` inside with_columns broadcasts
# the whole-column aggregate to every row (reference golden:
# tests/services/test_basic_pipeline.py:85,192-194). A global Window would
# collapse to a single partition at scale; the pipeline instead compiles
# these via agg + broadcast cross-join (see operators/transform.py
# derive_new_cols). Here we only record the agg builder.

AGG_FNS: dict[str, Callable[..., Column]] = {
    "mean": _f_func(F.mean),
    "sum": _f_func(F.sum),
    "min": _f_func(F.min),
    "max": _f_func(F.max),
    "count": _f_func(F.count),
    "median": _f_func(F.median),
    "std": lambda col, ddof=1: F.stddev_samp(F.col(col)) if ddof else F.stddev_pop(F.col(col)),
    "var": lambda col, ddof=1: F.var_samp(F.col(col)) if ddof else F.var_pop(F.col(col)),
    "n_unique": _f_func(F.countDistinct),
    "approx_n_unique": _f_func(F.approx_count_distinct),
    "first": _f_func(F.first),
    "last": _f_func(F.last),
}

# --- cumulative / positional, over an explicit ordered window ---------------
# Polars cumulatives follow implicit row order; Spark has none, so these
# REQUIRE an `order_by` kwarg naming the ordering column(s)
# (SURVEY.md §7.4.1). `partition_by` keeps the window distributed; without
# it Spark warns and runs single-partition — acceptable only at test scale.

def _cum_fn(agg: Callable[[Column], Column]) -> Callable[..., Column]:
    def fn(
        col: str,
        order_by: str | list[str],
        partition_by: str | list[str] | None = None,
    ) -> Column:
        order = [order_by] if isinstance(order_by, str) else list(order_by)
        w = Window.orderBy(*order)
        if partition_by:
            part = [partition_by] if isinstance(partition_by, str) else list(partition_by)
            w = Window.partitionBy(*part).orderBy(*order)
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return agg(F.col(col)).over(w)

    return fn


def _shift_fn(col: str, n: int = 1, order_by: str | list[str] = None, partition_by=None) -> Column:
    if order_by is None:
        raise ValueError("shift requires order_by (Spark has no implicit row order)")
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.orderBy(*order)
    if partition_by:
        part = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = Window.partitionBy(*part).orderBy(*order)
    return F.lag(F.col(col), n).over(w)


def _ranking_fn(
    rank_f: Callable[[], Column],
    name: str,
    default_order_to_value: bool = False,
) -> Callable[..., Column]:
    """rank/row_number over an EXPLICIT order key. r12 verdict: these
    accepted order_by=None silently (ordering by the value column) while
    shift raised — an inconsistency in the one registry whose contract is
    "explicit order or refuse".

    r14 (r13 ADVICE): the refusal split by determinism, not by name.
    ``rank`` with ``order_by=None`` defaults to ordering by the VALUE
    column — that is the reference's ``pl.Expr.rank()`` semantics
    (reference registry exposes bare ``rank``), and it is deterministic:
    equal values tie to equal ranks regardless of row order, so existing
    reference configs keep working. ``row_number`` keeps the hard refusal:
    its output genuinely depends on row order, which Spark does not have."""

    def fn(
        col: str,
        order_by: str | list[str] | None = None,
        partition_by: str | list[str] | None = None,
    ) -> Column:
        if order_by is None and default_order_to_value:
            order_by = col
        if order_by is None:
            raise ValueError(
                f"{name} requires order_by (Spark has no implicit row "
                f"order, and {name} output depends on it); rank by an "
                "explicit column instead"
            )
        order = [order_by] if isinstance(order_by, str) else list(order_by)
        if partition_by:
            part = [partition_by] if isinstance(partition_by, str) else list(partition_by)
            w = Window.partitionBy(*part).orderBy(*order)
        else:
            w = Window.partitionBy().orderBy(*order)
        return rank_f().over(w)

    return fn


CUMULATIVE_FNS: dict[str, Callable[..., Column]] = {
    "cum_sum": _cum_fn(F.sum),
    "cum_min": _cum_fn(F.min),
    "cum_max": _cum_fn(F.max),
    "cum_count": _cum_fn(F.count),
    "shift": _shift_fn,
    "diff": lambda col, order_by, partition_by=None: F.col(col)
    - _shift_fn(col, 1, order_by, partition_by),
    "rank": _ranking_fn(F.rank, "rank", default_order_to_value=True),
    "row_number": _ranking_fn(F.row_number, "row_number"),
}

CUSTOM_DERIVE_FNS: dict[str, Callable[..., Column]] = {
    "add_cols": add_cols,
    "sub_cols": sub_cols,
    "mul_cols": mul_cols,
    "div_cols": div_cols,
}

# The full public registry (reference merges CUSTOM_DERIVE_FNS over
# PL_EXPR_FNS at transform.py:248).
ALL_DERIVE_FNS: dict[str, Callable[..., Column]] = {
    **SCALAR_FNS,
    **CUMULATIVE_FNS,
    **CUSTOM_DERIVE_FNS,
}


# ---------------------------------------------------------------------------
# Shared expression helpers with declared null semantics (SURVEY.md §1.3)
# ---------------------------------------------------------------------------


def clip_expr(col: str | Column, lower: Any = None, upper: Any = None) -> Column:
    """Null-preserving clip. Polars ``clip`` keeps null as null; Spark's
    ``least``/``greatest`` skip nulls, so guard explicitly."""
    c = F.col(col) if isinstance(col, str) else col
    clipped = c
    if lower is not None:
        clipped = F.greatest(clipped, F.lit(lower))
    if upper is not None:
        clipped = F.least(clipped, F.lit(upper))
    return F.when(c.isNull(), F.lit(None)).otherwise(clipped)


def strip_whitespace(col: str | Column) -> Column:
    """Full-whitespace strip. Polars ``str.strip_chars()`` strips ALL
    whitespace (tabs, newlines); Spark ``trim`` strips spaces only — use a
    regexp for parity (SURVEY.md §7.4.5)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, r"^\s+", ""), r"\s+$", "")


def _polars_interval_to_spark(every: str) -> str:
    """Map Polars truncate intervals ('1d', '1h', …) to Spark date_trunc units."""
    table = {
        "1y": "year", "1mo": "month", "1w": "week", "1d": "day",
        "1h": "hour", "1m": "minute", "1s": "second",
    }
    return table.get(every, every)
