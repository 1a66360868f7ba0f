"""Aggregation helpers for skewed data.

``salted_agg``: two-stage aggregation for hot keys. Stage 1 groups by
(key, salt) — the hot key's rows spread over ``n_salts`` reducers — and
computes PARTIAL aggregates; stage 2 groups by key and merges. Results
are identical to a direct groupBy for the supported algebraic aggregates;
the win is that no single reducer sees all rows of a hot key.

AQE's skew-join handling covers joins; this covers aggregations whose
per-key cardinality is extreme (e.g. counting tokens where one token is
40% of a 100 TB corpus). For merely-large data, plain groupBy + map-side
partial aggregation (automatic) is already optimal — use salting only
when a key's row count exceeds what one task should hold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate name -> (partial agg builder, merge agg builder)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """``aggs``: {out_name: (agg_fn_name, col)} with agg_fn_name in
    sum/count/min/max (mean = sum+count composed by the caller).

    Example::

        salted_agg(df, ["token"], {"n": ("count", "token"),
                                   "total": ("sum", "value")})
    """
    unknown = [a for a, (fn, _) in aggs.items() if fn not in _ALGEBRAIC]
    if unknown:
        raise KeyError(f"non-algebraic aggregates not saltable: {unknown}")

    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*group_cols, "__salt").agg(
        *[
            _ALGEBRAIC[fn][0](F.col(col)).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*group_cols).agg(
        *[
            _ALGEBRAIC[fn][1](F.col(f"__p_{name}")).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )


def mean_via_salted(df: DataFrame, group_cols: list[str], col: str, out: str = "mean") -> Column:
    """Convenience: skew-safe mean = salted sum / salted count."""
    agged = salted_agg(
        df, group_cols, {"__sum": ("sum", col), "__cnt": ("count", col)}
    )
    return agged.withColumn(out, F.col("__sum") / F.col("__cnt")).drop("__sum", "__cnt")
