"""Descriptive statistics: the reference's ``describe_lf`` re-expressed.

Reference (src/polars_pipe/core/inspect.py:29-48): ``lf.describe()`` cast
all-string, then vstack one extra row per custom statistic (default:
null_proportion, n_unique). Output shape: long-format — one row per
statistic, one string column per data column, leading "statistic" column.

Spark design:
- One ``df.agg(...)`` pass computes EVERY (statistic, column) cell —
  count/null_count/mean/std/min/max/percentiles/custom — in a single job
  (the reference evaluates the plan once per custom statistic,
  inspect.py:43-46; at 100 TB that's N full scans → we do 1).
- Percentiles are EXACT (``F.percentile``) for oracle parity at test
  scale; pass ``approx=True`` for the 100 TB path
  (``F.percentile_approx``) — SURVEY.md §2.6 A1.
- Numeric stats on non-numeric columns are NULL-valued cells (Polars
  describe shows null there too); everything is cast to string at the end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _null_proportion(c: str) -> Column:
    return F.sum(F.col(c).isNull().cast("long")) / F.count(F.lit(1))


def _n_unique(c: str) -> Column:
    return F.countDistinct(F.col(c))


CUSTOM_STATISTICS: dict[str, Callable[[str], Column]] = {
    "null_proportion": _null_proportion,
    "n_unique": _n_unique,
}


def describe_df(
    df: DataFrame,
    custom_statistics: dict[str, Callable[[str], Column]] = CUSTOM_STATISTICS,
    approx: bool = False,
) -> DataFrame:
    """Long-format stats table: rows = count, null_count, mean, std, min,
    25%, 50%, 75%, max, then one row per custom statistic; columns =
    "statistic" + every input column, all strings."""
    cols = df.columns
    num = {
        f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)
    }
    orderable = {
        f.name
        for f in df.schema.fields
        if not isinstance(f.dataType, (T.MapType, T.StructType, T.ArrayType))
    }

    def pct(c: str, p: float) -> Column:
        if approx:
            return F.percentile_approx(F.col(c), p)
        return F.percentile(F.col(c), p)

    null_str = F.lit(None).cast("string")

    def cell(stat: str, c: str) -> Column:
        if stat == "count":
            e = F.count(F.col(c))
        elif stat == "null_count":
            e = F.sum(F.col(c).isNull().cast("long"))
        elif stat == "mean":
            e = F.mean(F.col(c)) if c in num else None
        elif stat == "std":
            e = F.stddev_samp(F.col(c)) if c in num else None
        elif stat == "min":
            e = F.min(F.col(c)) if c in orderable else None
        elif stat == "25%":
            e = pct(c, 0.25) if c in num else None
        elif stat == "50%":
            e = pct(c, 0.5) if c in num else None
        elif stat == "75%":
            e = pct(c, 0.75) if c in num else None
        elif stat == "max":
            e = F.max(F.col(c)) if c in orderable else None
        else:
            raise AssertionError(stat)
        return (e.cast("string") if e is not None else null_str).alias(f"{stat}::{c}")

    stats = ["count", "null_count", "mean", "std", "min", "25%", "50%", "75%", "max"]
    aggs = [cell(s, c) for s in stats for c in cols]
    aggs += [
        fn(c).cast("string").alias(f"{name}::{c}")
        for name, fn in custom_statistics.items()
        for c in cols
    ]
    row = df.agg(*aggs).collect()[0].asDict()

    all_stats = stats + list(custom_statistics)
    out_rows = [
        tuple([s] + [row[f"{s}::{c}"] for c in cols]) for s in all_stats
    ]
    schema = T.StructType(
        [T.StructField("statistic", T.StringType())]
        + [T.StructField(c, T.StringType()) for c in cols]
    )
    # A stats table has ~11 rows — one partition, one output file.
    return df.sparkSession.createDataFrame(out_rows, schema).coalesce(1)


def k_anonymity_report(
    df: "DataFrame",
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> "DataFrame":
    """Privacy re-identification audit before a dataset release:
    k-anonymity (every combination of quasi-identifier values — the
    equivalence class — must cover ≥ k rows) and, when
    ``sensitive_col`` is given, l-diversity (distinct sensitive values
    within each class).

    One summary row: total rows, class count, the smallest class, rows
    sitting in classes below ``k`` (the re-identifiable population) and
    their integer-exact ppm share, plus ``min_l``. Shape: a single
    groupBy over the quasi columns followed by a global 1-row aggregate
    of per-class counts — two map-side-combinable stages; the widest
    intermediate is one row per equivalence class. No quasi-identifier
    VALUES leave the executors (the summary is counts only), which is
    the point for a privacy audit at 100 TB.
    """
    per_class = [
        F.count(F.lit(1)).alias("__size"),
    ]
    if sensitive_col is not None:
        per_class.append(F.countDistinct(sensitive_col).alias("__l"))
    classes = df.groupBy(*quasi_cols).agg(*per_class)
    aggs = [
        F.sum("__size").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("__size").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("__size") < k, F.col("__size")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_below_k"),
    ]
    if sensitive_col is not None:
        aggs.append(F.min("__l").cast("long").alias("min_l"))
    out = classes.agg(*aggs)
    # integer floor-division: double-quotient-then-cast would hit the
    # Spark-truncates / DuckDB-rounds cast seam
    return out.withColumn(
        "below_k_ppm",
        F.expr(
            "CASE WHEN n_rows > 0 THEN "
            "CAST((rows_below_k * 1000000) DIV n_rows AS BIGINT) END"
        ),
    )
