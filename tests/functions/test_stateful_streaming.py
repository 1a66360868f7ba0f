"""Custom stateful streaming operator (applyInPandasWithState)."""

from __future__ import annotations

import datetime as dt
import tempfile

from polars_pipe_spark.streaming.pipeline import stateful_running_totals


class TestStreamStreamJoin:
    def test_interval_join_between_two_streams(self, spark):
        """Stream-stream inner join with watermarks + time-interval
        condition (purchases matched to clicks within the prior hour)."""
        from pyspark.sql import functions as F

        rows = [
            (1, 7, dt.datetime(2024, 1, 1, 10, 0), "click", 1.0),
            (2, 7, dt.datetime(2024, 1, 1, 10, 30), "purchase", 9.0),  # joins click@10:00
            (3, 7, dt.datetime(2024, 1, 1, 13, 0), "purchase", 5.0),   # no click within 1h
            (4, 8, dt.datetime(2024, 1, 1, 10, 15), "purchase", 2.0),  # other user: no click
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
        )
        src = tempfile.mkdtemp(prefix="pps_ssj_test_") + "/src"
        df.write.mode("overwrite").parquet(src)

        def stream():
            return spark.readStream.schema(df.schema).parquet(src)

        purchases = stream().filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
        ).withWatermark("p_ts", "2 hours")
        clicks = stream().filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"), F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        ).withWatermark("c_ts", "2 hours")

        # stream-stream joins REQUIRE an equality predicate (state keying);
        # the interval condition bounds state via both watermarks
        joined = purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
            "inner",
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_ssj_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        got = {(r.p_id, r.c_id) for r in spark.table("t_ssj_out").collect()}
        assert got == {(2, 1)}


class TestStatefulRunningTotals:
    def test_totals_accumulate_across_batches(self, spark):
        rows = [
            (1, dt.datetime(2024, 1, 1, 0, 0), 10.0),
            (1, dt.datetime(2024, 1, 1, 0, 1), 5.0),
            (2, dt.datetime(2024, 1, 1, 0, 2), 7.0),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        src = tempfile.mkdtemp(prefix="pps_state_test_") + "/src"
        df.write.mode("overwrite").parquet(src)

        stream = spark.readStream.schema(df.schema).parquet(src)
        out = stateful_running_totals(stream, "user_id", "value")
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("t_state_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        got = {
            r.user_id: (r.n_events, r.total)
            for r in spark.table("t_state_out").collect()
        }
        assert got == {1: (2, 15.0), 2: (1, 7.0)}


class TestSessionWindow:
    def test_session_event_stats_batch(self, spark):
        """Native session_window semantics: [start, end) windows — an
        event exactly gap after its predecessor opens a NEW session."""
        import datetime as dt

        from polars_pipe_spark.streaming.pipeline import session_event_stats

        t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
        rows = [
            ("u", t0),
            ("u", t0 + dt.timedelta(minutes=10)),   # same session (<30m)
            ("u", t0 + dt.timedelta(minutes=40)),   # EXACTLY 30m after #2:
            # merged (inclusive boundary — pinned here, oracle uses > gap)
            ("u", t0 + dt.timedelta(minutes=95)),   # 55m gap -> new session
            ("v", t0),
        ]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp")
        out = session_event_stats(df, "ts", "30 minutes", group_cols=["user_id"])
        got = {(r.user_id, r.session_start, r.n_events) for r in out.collect()}
        assert got == {
            ("u", t0, 3),
            ("u", t0 + dt.timedelta(minutes=95), 1),
            ("v", t0, 1),
        }
        ends = {r.session_start: r.session_end for r in out.collect() if r.user_id == "u"}
        # end = last event + gap
        assert ends[t0] == t0 + dt.timedelta(minutes=70)


class TestClickAttributionJoin:
    def _frames(self, spark):
        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        purchases = spark.createDataFrame(
            [(1, 100, t0, 9.99)],
            "user_id long, purchase_id long, ts timestamp, value double",
        )
        clicks = spark.createDataFrame(
            [
                (1, 200, t0 - dt.timedelta(minutes=30), 1.0),   # in window
                (1, 201, t0 - dt.timedelta(hours=1), 2.0),      # exactly -1h: inclusive
                (1, 202, t0 - dt.timedelta(hours=1, seconds=1), 3.0),  # too old
                (1, 203, t0, 4.0),                              # same instant: inclusive
                (1, 204, t0 + dt.timedelta(seconds=1), 5.0),    # after purchase
                (2, 205, t0 - dt.timedelta(minutes=5), 6.0),    # other user
            ],
            "user_id long, click_id long, click_ts timestamp, click_value double",
        )
        return purchases, clicks

    def test_batch_window_boundaries(self, spark):
        from polars_pipe_spark.streaming.pipeline import click_attribution_join

        p, c = self._frames(spark)
        out = click_attribution_join(p, c, lookback="1 hour")
        assert sorted(r.click_id for r in out.collect()) == [200, 201, 203]

    def test_streaming_matches_batch(self, spark):
        """Real stream-stream join (two file sources, watermarks, append)
        returns the same rows as the batch twin."""
        from polars_pipe_spark.streaming.pipeline import click_attribution_join

        p, c = self._frames(spark)
        root = tempfile.mkdtemp(prefix="pps_ssj_test_")
        p.coalesce(1).write.parquet(f"{root}/p")
        c.coalesce(1).write.parquet(f"{root}/c")
        ps = spark.readStream.schema(p.schema).parquet(f"{root}/p")
        cs = spark.readStream.schema(c.schema).parquet(f"{root}/c")
        q = (
            click_attribution_join(ps, cs, lookback="1 hour")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("ssj_test")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        q.stop()
        got = sorted(r.click_id for r in spark.table("ssj_test").collect())
        assert got == [200, 201, 203]


class TestStreamingUpsertSink:
    def test_sequential_batches_converge(self, spark):
        from polars_pipe_spark.streaming.pipeline import streaming_upsert_sink

        root = tempfile.mkdtemp(prefix="pps_upsert_")
        src, tgt, ckpt = f"{root}/src", f"{root}/tgt", f"{root}/ckpt"
        b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        b1.coalesce(1).write.mode("append").parquet(src)
        schema = b1.schema

        q = streaming_upsert_sink(src, schema, tgt, ckpt, keys=["k"])
        q.awaitTermination(60)
        q.stop()
        got = {r.k: r.v for r in spark.read.parquet(tgt).collect()}
        assert got == {1: "a", 2: "b"}

        # a later micro-batch updates key 2 and inserts key 3
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string") \
            .coalesce(1).write.mode("append").parquet(src)
        q = streaming_upsert_sink(src, schema, tgt, ckpt, keys=["k"])
        q.awaitTermination(60)
        q.stop()
        got = {r.k: r.v for r in spark.read.parquet(tgt).collect()}
        assert got == {1: "a", 2: "B", 3: "c"}


class TestCheckpointRecovery:
    def test_restart_processes_only_new_files_exactly_once(self, spark, tmp_path):
        """Stop a checkpointed file-source stream, add new input, restart
        with the SAME checkpoint: the restarted query must pick up only
        the unseen files — every input row lands in the sink exactly
        once across the two runs (the recovery contract the 100 TB
        ingest path depends on)."""
        src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
        spark.range(0, 5).selectExpr("id", "id * 10 AS v").write.mode(
            "append"
        ).parquet(src)
        schema = spark.read.parquet(src).schema

        def run_once():
            q = (
                spark.readStream.schema(schema)
                .parquet(src)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()

        run_once()
        got1 = {r.id for r in spark.read.parquet(out).collect()}
        assert got1 == set(range(5))

        spark.range(5, 8).selectExpr("id", "id * 10 AS v").write.mode(
            "append"
        ).parquet(src)
        run_once()
        rows = spark.read.parquet(out).collect()
        assert {r.id for r in rows} == set(range(8))
        assert len(rows) == 8  # batch-1 rows were NOT reprocessed
