"""CDC merge/SCD2 and deterministic sampling tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from polars_pipe_spark.functions.sampling import hash_sample, md5_bucket, train_test_split
from polars_pipe_spark.operators.cdc import apply_deletes, merge_upsert, scd2_apply


class TestMergeUpsert:
    def test_upsert_semantics(self, spark):
        base = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
        )
        updates = spark.createDataFrame(
            [(2, "B", 22.0), (4, "d", 40.0)], "k int, s string, v double"
        )
        out = {r.k: (r.s, r.v) for r in merge_upsert(base, updates, ["k"]).collect()}
        assert out == {1: ("a", 10.0), 2: ("B", 22.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    def test_deletes(self, spark):
        base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
        dels = spark.createDataFrame([(2,)], "k int")
        assert [r.k for r in apply_deletes(base, dels, ["k"]).collect()] == [1]


class TestScd2:
    def test_close_and_append(self, spark):
        t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
        dim = spark.createDataFrame(
            [(1, "old", t1, None), (2, "keep", t1, None)],
            "k int, attr string, valid_from timestamp, valid_to timestamp",
        )
        changes = spark.createDataFrame([(1, "new", t2)], "k int, attr string, ts timestamp")
        out = scd2_apply(dim, changes, "k", "ts")
        rows = {(r.k, r.attr): (r.valid_from, r.valid_to) for r in out.collect()}
        assert rows[(1, "old")] == (t1, t2)      # closed at change ts
        assert rows[(1, "new")] == (t2, None)    # new current version
        assert rows[(2, "keep")] == (t1, None)   # untouched
        assert out.count() == 3


class TestSampling:
    def test_buckets_uniform_and_deterministic(self, spark):
        df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
        a = [r.b for r in df.select(md5_bucket("id").alias("b")).collect()]
        b = [r.b for r in df.select(md5_bucket("id").alias("b")).collect()]
        assert a == b
        assert all(0 <= x < 100 for x in a)
        # roughly uniform: every decile sees traffic
        per_decile = [sum(1 for x in a if x // 10 == d) for d in range(10)]
        assert min(per_decile) > 100

    def test_hash_sample_fraction(self, spark):
        df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
        n = hash_sample(df, "id", 0.2).count()
        assert 300 < n < 500  # ~400 expected

    def test_split_stable_under_growth(self, spark):
        """Rows keep their split label when the dataset grows — the whole
        point of content-deterministic splitting."""
        small = spark.createDataFrame([(i,) for i in range(100)], "id long")
        big = spark.createDataFrame([(i,) for i in range(1000)], "id long")
        s = {r.id: r.split for r in train_test_split(small, "id").collect()}
        b = {r.id: r.split for r in train_test_split(big, "id").collect()}
        assert all(b[i] == s[i] for i in s)

    def test_split_labels(self, spark):
        df = spark.createDataFrame([(i,) for i in range(500)], "id long")
        out = train_test_split(df, "id", test_fraction=0.2)
        counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
        assert set(counts) == {"train", "test"}
        assert 60 < counts["test"] < 140  # ~100
