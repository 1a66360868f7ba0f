"""Pivot / unpivot operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_pipe_spark.operators.reshape import pivot_table, unpivot


class TestPivot:
    def test_pivot_explicit_values(self, spark):
        df = spark.createDataFrame(
            [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)],
            "g string, p string, v double",
        )
        out = pivot_table(
            df, ["g"], "p", ["x", "y", "z"], F.sum("v"),
            rename={"z": "z_total"}, fill_value=0,
        )
        rows = {r.g: (r.x, r.y, r.z_total) for r in out.collect()}
        assert rows == {"a": (1.0, 2.0, 0.0), "b": (3.0, 0.0, 0.0)}

    def test_pivot_no_distinct_scan(self, spark):
        """Explicit values → building the pivot plan triggers NO Spark job
        (implicit pivot runs a distinct-discovery job up front — a full
        scan at 100 TB)."""
        df = spark.createDataFrame([("a", "x", 1.0)], "g string, p string, v double")
        sc = spark.sparkContext
        sc.setJobGroup("pivot_build", "pivot plan build")
        try:
            pivot_table(df, ["g"], "p", ["x"], F.sum("v"))  # plan only, no action
            jobs = sc.statusTracker().getJobIdsForGroup("pivot_build")
        finally:
            sc.setJobGroup(None, None)
        assert len(jobs) == 0


class TestUnpivot:
    def test_melt_roundtrip(self, spark):
        df = spark.createDataFrame([(1, 10, 1.5)], "id int, a int, b double")
        out = unpivot(df, ["id"], ["a", "b"], "metric", "val")
        got = {(r.id, r.metric): r.val for r in out.collect()}
        assert got == {(1, "a"): 10.0, (1, "b"): 1.5}

    def test_melt_custom_labels_no_shuffle(self, spark):
        df = spark.createDataFrame([(1, 10, 1.5)], "id int, a int, b double")
        out = unpivot(df, ["id"], {"a": "alpha", "b": "beta"})
        assert {r.variable for r in out.collect()} == {"alpha", "beta"}
        assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
