"""CDC-style table maintenance without a lakehouse format: merge/upsert
and SCD2 emulation from plain DataFrames.

The v1 environment has no Delta/Iceberg jars (MERGE INTO unavailable), so
these implement the standard emulation: anti-join + union for upsert,
window-close + append for SCD2. Both are single-shuffle-per-input
operations on the merge key and AQE-friendly. With a lakehouse table
format available, swap the sink for MERGE INTO and keep the same call
sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Upsert ``updates`` into ``base`` by ``keys``: matching base rows are
    replaced, new keys are inserted, unmatched base rows pass through.
    One anti-join shuffle; updates must be key-unique."""
    untouched = base.join(updates.select(*keys), on=keys, how="left_anti")
    return updates.unionByName(untouched)


def apply_deletes(base: DataFrame, deletes: DataFrame, keys: list[str]) -> DataFrame:
    """Remove rows whose key appears in ``deletes`` (anti-join)."""
    return base.join(deletes.select(*keys), on=keys, how="left_anti")


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close current rows touched by a
    change (set ``valid_to`` = change timestamp) and append the new
    versions as current (``valid_to`` null).

    ``dim`` carries (key, attrs…, valid_from, valid_to); ``changes``
    carries (key, attrs…, change_ts). Assumes one change per key per
    batch (pre-aggregate upstream otherwise)."""
    ch = changes.withColumnsRenamed({change_ts_col: "__ch_ts"})
    closing = (
        dim.filter(F.col(valid_to).isNull())
        .join(ch.select(key, "__ch_ts"), on=key, how="inner")
        .withColumn(valid_to, F.col("__ch_ts"))
        .drop("__ch_ts")
    )
    untouched = dim.join(ch.select(key), on=key, how="left_anti")
    still_open_history = dim.filter(F.col(valid_to).isNotNull()).join(
        ch.select(key), on=key, how="left_semi"
    )
    new_rows = (
        ch.withColumn(valid_from, F.col("__ch_ts"))
        .withColumn(valid_to, F.lit(None).cast(dim.schema[valid_to].dataType))
        .drop("__ch_ts")
        .select(*dim.columns)
    )
    return untouched.unionByName(still_open_history).unionByName(closing).unionByName(new_rows)
