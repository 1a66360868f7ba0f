"""Dtype-name resolution: config strings → Spark types.

The reference harvests every Polars dtype reflectively into
``POLARS_DTYPE_MAPPING`` so configs can say ``{"recast_map": {"bonus":
"Int64"}}`` (reference: src/polars_pipe/core/transform.py:20-22, resolved at
:45-47). We use a curated static table instead, accepting BOTH Polars-style
names and Spark DDL names, so existing reference configs keep working.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Polars-style names (reference config surface) + Spark DDL names.
_DTYPE_TABLE: dict[str, T.DataType] = {
    # Polars-style
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.LongType(),  # declared: unsigned 64-bit maps to signed long
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "utf8": T.StringType(),
    "string": T.StringType(),
    "str": T.StringType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "time": T.StringType(),  # Spark has no TimeType; declared: string
    "duration": T.DayTimeIntervalType(),
    "decimal": T.DecimalType(38, 18),
    "binary": T.BinaryType(),
    "null": T.NullType(),
    # Spark DDL style
    "byte": T.ByteType(),
    "tinyint": T.ByteType(),
    "short": T.ShortType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
}


def resolve_dtype(name: str | T.DataType) -> T.DataType:
    """Resolve a config dtype name (Polars-style or Spark DDL) to a Spark type.

    Raises ``KeyError`` with the supported-name list on unknown names —
    mirrors the reference's KeyError on unknown Polars dtype strings.
    """
    if isinstance(name, T.DataType):
        return name
    key = str(name).strip().lower()
    if key in _DTYPE_TABLE:
        return _DTYPE_TABLE[key]
    # Fall back to Spark DDL parsing for compound types: "array<int>",
    # "struct<a:int>", "decimal(10,2)", "map<string,double>".
    try:
        return T._parse_datatype_string(key)
    except Exception:
        raise KeyError(
            f"unknown dtype name {name!r}; supported: {sorted(_DTYPE_TABLE)} "
            "or any Spark DDL type string"
        ) from None


SYS_COL_PREFIX = "sys_col"
