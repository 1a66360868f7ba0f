"""Custom stateful streaming operator (applyInPandasWithState)."""

from __future__ import annotations

import datetime as dt
import tempfile

from polars_pipe_spark.streaming.pipeline import stateful_running_totals


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
