"""Multi-dimensional data layout: Z-order (Morton) clustering.

Sorting a table by the interleaved bits of several quantized columns
co-locates rows that are close in EVERY dimension, so min/max file
statistics prune scans for predicates on ANY of the clustered columns —
the effect Delta's OPTIMIZE ZORDER BY and Iceberg's sort orders target.
Here it is a pure expression: quantize each column to ``bits`` levels
against broadcast min/max bounds, interleave bits into a single long,
then ``repartitionByRange`` on that key so each output file covers a
tight Z-range.

Everything is integer/IEEE-exact arithmetic (no engine-specific hash),
so a SQL oracle reproduces the codes bit for bit.

No reference implementation (the reference has no layout surface);
Spark-native extension alongside ``adapters/io.py::write_parquet_partitioned``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Map ``col`` linearly into ``[0, 2^bits)`` against given bounds.

    IEEE +,-,*,/ and floor are exactly specified, so any engine
    evaluating this expression produces identical codes.
    """
    levels = float((1 << bits) - 1)
    span = (cmax - cmin).cast("double")
    frac = F.when(span > 0, (col.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.floor(frac * levels).cast("long")


def morton_code(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (already quantized)
    column into one long: bit ``i`` of column ``j`` lands at position
    ``i * n_cols + j``. ``bits * len(cols)`` must stay below 63."""
    if bits * len(cols) > 62:
        raise ValueError("morton code would overflow a long")
    code = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1).cast("long"))
            code = code.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return code


def zorder_by(
    df: DataFrame, cols: list[str], bits: int = 16, n_files: int | None = None
) -> DataFrame:
    """Return ``df`` with a ``__zorder`` column, range-partitioned AND
    sorted by it (each output file covers one tight Z-range, and row
    groups within a file are Z-contiguous for min/max pruning). Bounds
    come from one corpus aggregate broadcast back — no collect, no
    second scan plan.

    Pass ``n_files`` to pin the output file count: without it the range
    shuffle inherits ``spark.sql.shuffle.partitions`` and AQE may
    coalesce small outputs into one partition, which collapses the
    layout (observed at test scale).

    Write the result with ``.write.parquet`` to materialise the layout;
    drop ``__zorder`` afterwards if undesired.
    """
    bounds = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    quantized = [
        quantize(
            F.col(c), F.col(f"__min_{c}"), F.col(f"__max_{c}"), bits
        )
        for c in cols
    ]
    out = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__zorder", morton_code(quantized, bits))
        .drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
    )
    parts = [n_files] if n_files else []
    return out.repartitionByRange(*parts, "__zorder").sortWithinPartitions("__zorder")
