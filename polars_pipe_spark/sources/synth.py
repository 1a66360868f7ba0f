"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-events generator, registered as a real
``spark.read.format(...)`` source.

Why it exists: the engine's source surface should be EXTENSIBLE the way
its transform surface is (custom transformations) — the Python
DataSource API is the Spark-4-native seam for reading anything that has
no built-in connector (internal services, bespoke formats) without JVM
code. This module exercises the full contract: schema declaration,
option handling, and PARTITIONED reads (one ``InputPartition`` per
shard, so a 1000-executor cluster reads 1000 shards concurrently —
the reader never funnels through the driver).

Determinism: rows are a pure function of (seed, row index) via md5, so
the same options produce identical data on any cluster layout — the
same content-hash discipline as `functions/sampling`.

Usage::

    from polars_pipe_spark.sources.synth import register_synth_source
    register_synth_source(spark)
    df = (spark.read.format("pps_synth")
          .option("rows", 10_000).option("partitions", 8)
          .option("seed", 7).load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SYNTH_SCHEMA_DDL = (
    "event_id bigint, user_id bigint, event_type string, value double"
)
_EVENT_TYPES = ["view", "click", "purchase", "signup"]


def _row(seed: int, i: int) -> tuple[int, int, str, float]:
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    user = int(h[:8], 16) % 1000
    etype = _EVENT_TYPES[int(h[8:10], 16) % len(_EVENT_TYPES)]
    value = round(int(h[10:18], 16) % 100_000 / 100.0, 2)
    return i, user, etype, value


class _Shard(InputPartition):
    def __init__(self, start: int, end: int, seed: int) -> None:
        self.start, self.end, self.seed = start, end, seed


class _SynthReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(int(options.get("partitions", 4)), 1)
        self.seed = int(options.get("seed", 0))

    def partitions(self) -> list[InputPartition]:
        per = -(-self.rows // self.n_parts)  # ceil
        return [
            _Shard(lo, min(lo + per, self.rows), self.seed)
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Shard) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i)


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream of the same deterministic rows: the offset is
    just the next row index, so replay (``readBetweenOffsets``) is
    trivially exactly-once — re-generating a committed range yields the
    identical rows. ``batch_rows`` rows arrive per micro-batch."""

    def __init__(self, options: dict) -> None:
        self.seed = int(options.get("seed", 0))
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        s = int(start["idx"])
        e = s + self.batch_rows
        return iter([_row(self.seed, i) for i in range(s, e)]), {"idx": e}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([_row(self.seed, i) for i in range(int(start["idx"]), int(end["idx"]))])


class SynthEventsDataSource(DataSource):
    """``format("pps_synth")`` — deterministic synthetic events, batch
    AND micro-batch streaming from one registration."""

    @classmethod
    def name(cls) -> str:
        return "pps_synth"

    def schema(self) -> str:
        return SYNTH_SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SynthReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _SynthStreamReader(self.options)


def register_synth_source(spark) -> None:
    spark.dataSource.register(SynthEventsDataSource)
