"""Parquet table loading with nanosecond-timestamp compatibility.

Some writers (pandas/polars defaults) produce parquet TIMESTAMP(NANOS)
columns, which Spark's vectorized reader rejects
(PARQUET_TYPE_ILLEGAL). Strategy: inspect the parquet footer schema
driver-side (pyarrow — metadata only, no data read), and when a
timestamp[ns] column is present, read it as raw nanos
(``spark.sql.legacy.parquet.nanosAsLong``) and rebuild the timestamp with
exact integer division to microseconds (``ts div 1000`` — no double
round-trip, so no precision loss). DuckDB truncates ns→µs the same way,
keeping oracle parity.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nanos_cols(path: str) -> list[str]:
    """Names of timestamp[ns] columns, from the parquet footer (no scan)."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            return []
        path = files[0]
    schema = pq.read_schema(path)
    return [
        name
        for name, typ in zip(schema.names, schema.types)
        if isinstance(typ, pa.TimestampType) and typ.unit == "ns"
    ]


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def tz_normalise(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (session tz, pinned UTC).

    Parquet written with isAdjustedToUTC=false (pandas/polars default for
    naive datetimes) reads as TIMESTAMP_NTZ in Spark 3.4+. NTZ cannot be
    an event-time watermark column and rejects numeric casts, while DuckDB
    reads the same file as its naive TIMESTAMP. With the session timezone
    pinned to UTC the NTZ→TZ cast is value-preserving and bijective, so
    oracle parity holds and every downstream operator (streaming
    watermarks, epoch arithmetic) sees the one timestamp type.
    """
    from pyspark.sql import types as T

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


# Internal alias kept for in-package callers; external modules (streaming,
# the entry file) import the public name above.
_tz_normalise = tz_normalise


def read_parquet_table(spark: SparkSession, path: str, **kw) -> DataFrame:
    ns = _nanos_cols(path)
    if not ns:
        return _tz_normalise(spark.read.parquet(path, **kw))
    # The conf is captured by the DataFrame at creation (verified: collect
    # succeeds after restore), so restoring here cannot corrupt this read —
    # and later plain reads of ns files fail LOUDLY (PARQUET_TYPE_ILLEGAL)
    # instead of silently yielding raw longs.
    prev = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(path, **kw)
    finally:
        if prev is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prev)
    return _tz_normalise(
        df.withColumns({c: F.expr(f"timestamp_micros(`{c}` div 1000)") for c in ns})
    )


def load_tables(spark: SparkSession, sf_dir: str, names: list[str]) -> dict[str, DataFrame]:
    return {n: read_parquet_table(spark, f"{sf_dir}/{n}.parquet") for n in names}
