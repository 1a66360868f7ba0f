"""Deterministic sampling and dataset splitting for training pipelines.

Random sampling (``df.sample``/``sampleBy``) is seed-dependent but not
reproducible across engines or partitionings; training-data pipelines
want CONTENT-DETERMINISTIC sampling: the same row lands in the same
split everywhere, forever. These use md5 of a key column — portable to
any engine (the DuckDB oracle reproduces it exactly), stable under
repartitioning, and uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_bucket(col: str | Column, n_buckets: int = 100) -> Column:
    """Uniform bucket in [0, n_buckets) from the first 4 md5 nibbles of
    the key (pure expression arithmetic — no engine-specific hash)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c.cast("string"))
    val = F.lit(0)
    for i in range(1, 5):
        nib = F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
        val = val * 16 + nib
    return val % n_buckets


def hash_sample(df: DataFrame, key_col: str, fraction: float, n_buckets: int = 100) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key content."""
    return df.filter(md5_bucket(key_col, n_buckets) < int(fraction * n_buckets))


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    split_col: str = "split",
    n_buckets: int = 100,
) -> DataFrame:
    """Label every row 'train'/'test' deterministically by key content —
    rows never migrate between splits as the dataset grows."""
    cut = int(test_fraction * n_buckets)
    return df.withColumn(
        split_col,
        F.when(md5_bucket(key_col, n_buckets) < cut, F.lit("test")).otherwise(F.lit("train")),
    )
