"""Plan-level anti-pattern sweep over every registered query (r4 VERDICT
#8): builds each queries() DataFrame at sf0.001 and fails on the two plan
shapes that kill a 100 TB run regardless of bench-scale timing —
partition-less windows (single-reducer funnels) and non-broadcast
cartesian products. Queries with a deliberately global window over a
frame that is bounded BY CONSTRUCTION must be declared (with the bound)
in tools/plan_sweep.BOUNDED_GLOBAL_WINDOW; an undeclared one fails here.
"""

from __future__ import annotations

import pytest

from tools.plan_sweep import (
    BOUNDED_GLOBAL_WINDOW,
    MULTI_SCAN_OK,
    find_antipatterns,
    find_multi_scans,
    sweep,
)

SF_DIR = "/root/testdata/sf0.001"


class TestDetector:
    def test_flags_global_window(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        df = spark.range(10).withColumn(
            "s", F.sum("id").over(Window.orderBy("id"))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert any("global window" in f for f in find_antipatterns(plan))

    def test_keyed_window_clean(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        df = spark.range(10).withColumn(
            "s", F.sum("id").over(Window.partitionBy(F.col("id") % 3).orderBy("id"))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert find_antipatterns(plan) == []

    def test_flags_unpersisted_multi_scan(self, spark, tmp_path):
        from pyspark.sql import functions as F

        p = str(tmp_path / "t.parquet")
        spark.range(100).withColumn("v", F.col("id") % 7).write.parquet(p)
        df = spark.read.parquet(p)
        agg = df.groupBy("v").count()
        # the same derived frame consumed 3x without persist: three
        # live scans of one location in the final plan
        tri = (
            agg.join(agg.withColumnRenamed("count", "c2"), "v")
            .join(agg.withColumnRenamed("count", "c3"), "v")
        )
        plan = tri._jdf.queryExecution().executedPlan().toString()
        assert any("multi-scan" in f for f in find_multi_scans(plan))
        # persisting the shared frame clears the finding
        cached = agg.persist()
        try:
            tri2 = (
                cached.join(cached.withColumnRenamed("count", "c2"), "v")
                .join(cached.withColumnRenamed("count", "c3"), "v")
            )
            plan2 = tri2._jdf.queryExecution().executedPlan().toString()
            assert find_multi_scans(plan2) == []
        finally:
            cached.unpersist()

    def test_flags_shuffle_cartesian(self, spark):
        a = spark.range(10)
        b = spark.range(10).withColumnRenamed("id", "j")
        joined = a.join(b, a.id < b.j)  # non-equi, non-broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        assert any("cartesian" in f.lower() for f in find_antipatterns(plan))


@pytest.mark.slow
class TestFullSweep:
    def test_all_queries_clean(self, spark):
        results = sweep(spark, SF_DIR)
        assert results == {}, (
            "plan anti-patterns found (fix the plan, or if the window frame "
            "is bounded by construction, declare it in "
            f"tools/plan_sweep.BOUNDED_GLOBAL_WINDOW): {results}"
        )

    def test_exemptions_still_exist(self):
        import __spark_entry__ as entry

        q = set(entry.queries())
        stale = (set(BOUNDED_GLOBAL_WINDOW) | set(MULTI_SCAN_OK)) - q
        assert not stale, f"exempted queries no longer registered: {stale}"


class TestStructuralBoundedWindow:
    """r13 (verdict task 5): the bounded-global-window convention is now
    enforced by plan structure — a partition-less Window must have a
    limit/top-k or aggregate beneath it in its own input subtree, name
    whitelist or not."""

    def test_synthetic_violation_flagged(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from tools.plan_sweep import unbounded_global_windows

        # raw-scan global window: nothing bounds the frame
        df = spark.range(1000).withColumn(
            "s", F.sum("id").over(Window.orderBy("id"))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert any("UNBOUNDED global window" in f for f in unbounded_global_windows(plan))

    def test_limit_bounded_window_passes(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from tools.plan_sweep import unbounded_global_windows

        # the q54 shape: top-k first, then rank over exactly k rows
        df = (
            spark.range(1000)
            .orderBy(F.col("id").desc())
            .limit(20)
            .withColumn("r", F.rank().over(Window.orderBy(F.col("id").desc())))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert unbounded_global_windows(plan) == []

    def test_agg_bounded_window_passes(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from tools.plan_sweep import unbounded_global_windows

        # the q117 shape: aggregate to group grain, then cumulative
        df = (
            spark.range(1000)
            .groupBy((F.col("id") % 7).alias("day"))
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("cum", F.sum("n").over(Window.orderBy("day")))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert unbounded_global_windows(plan) == []

    def test_sweep_rejects_declared_but_unbounded(self, spark, tmp_path, monkeypatch):
        """A stale BOUNDED_GLOBAL_WINDOW declaration must not ride: the
        structural check runs regardless of the name table."""
        import __spark_entry__ as entry
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from tools import plan_sweep

        def bad_query(spark_, sf_dir_):
            return spark_.range(1000).withColumn(
                "s", F.sum("id").over(Window.orderBy("id"))
            )

        monkeypatch.setattr(
            entry, "queries", lambda: {"q999_bad": bad_query}
        )
        monkeypatch.setitem(
            plan_sweep.BOUNDED_GLOBAL_WINDOW, "q999_bad", "stale claim"
        )
        results = plan_sweep.sweep(spark, SF_DIR, ["q999_bad"])
        assert "q999_bad" in results
        assert any("UNBOUNDED" in f for f in results["q999_bad"])
