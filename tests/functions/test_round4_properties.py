"""Differential property tests for the round-4 operators: the Spark
result must equal a plain-Python model on arbitrary inputs (same
pattern as test_llm_ops_properties.py)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


class TestExactQuantileProperties:
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        vals=st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=1,
            max_size=60,
        ),
        q=st.sampled_from([0.0, 0.1, 0.5, 0.9, 1.0]),
        n_buckets=st.sampled_from([2, 5, 100]),
        thresh=st.sampled_from([1, 5, 1000]),
    )
    def test_matches_sorted_model(self, spark, vals, q, n_buckets, thresh):
        from polars_pipe_spark.operators.aggregates import exact_quantiles

        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = exact_quantiles(
            df, "x", [q], n_buckets=n_buckets, direct_threshold=thresh
        )
        s = sorted(vals)
        k = int(math.floor((len(s) - 1) * q))
        assert got[q] == (k, s[k]), (vals, q, n_buckets, thresh)


class TestFunnelProperties:
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        events=st.lists(
            st.tuples(
                st.integers(0, 3),              # user
                st.integers(0, 10),             # ts
                st.sampled_from(["a", "b", "c"]),  # stage
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_matches_python_model(self, spark, events):
        from polars_pipe_spark.operators.windows import funnel_counts

        stages = ["a", "b", "c"]
        df = spark.createDataFrame(
            [(u, float(t), s) for u, t, s in events],
            "uid long, ts double, stage string",
        )
        got = {
            r["stage"]: r["n_converted"]
            for r in funnel_counts(df, "uid", "ts", "stage", stages).collect()
        }
        model = dict.fromkeys(stages, 0)
        for u in {e[0] for e in events}:
            mins = {
                s: min((t for uu, t, ss in events if uu == u and ss == s), default=None)
                for s in stages
            }
            reach = mins["a"]
            if reach is not None:
                model["a"] += 1
                for s in stages[1:]:
                    t = mins[s]
                    if t is not None and t >= reach:
                        model[s] += 1
                        reach = t
                    else:
                        break
        assert got == model, events


class TestIncrementalDedupProperties:
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        batch=st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=12),
        index=st.lists(st.sampled_from(["x", "y"]), max_size=3),
    )
    def test_matches_python_model(self, spark, batch, index):
        from pyspark.sql import functions as F

        from polars_pipe_spark.functions.dedup import incremental_dedup
        from polars_pipe_spark.functions.text import normalize_text

        bdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
        )
        idx = spark.createDataFrame(
            [(t,) for t in index] or [("__none__",)], "text string"
        ).select(F.md5(normalize_text("text")).alias("fingerprint"))
        got = {
            r["doc_id"]: r["dedup_status"]
            for r in incremental_dedup(bdf, idx, "text", "doc_id").collect()
        }
        first_seen: dict[str, int] = {}
        for i, t in enumerate(batch):
            first_seen.setdefault(t, i)
        model = {}
        for i, t in enumerate(batch):
            if t in index:
                model[i] = "dup_of_index"
            elif first_seen[t] == i:
                model[i] = "new_unique"
            else:
                model[i] = "dup_within_batch"
        assert got == model, (batch, index)


class TestQualityBinProperties:
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        scores=st.lists(
            st.floats(0.0, 1.0, allow_nan=False), min_size=1, max_size=30
        ),
        n_bins=st.sampled_from([2, 7, 10]),
    )
    def test_matches_python_model(self, spark, scores, n_bins):
        from polars_pipe_spark.functions.sampling import quality_bins

        df = spark.createDataFrame([(s,) for s in scores], "score double")
        got = {
            r["bin_id"]: r["n_docs"]
            for r in quality_bins(df, "score", n_bins=n_bins).collect()
        }
        model: dict[int, int] = {}
        for s in scores:
            b = min(int(math.floor(s * n_bins)), n_bins - 1)
            model[b] = model.get(b, 0) + 1
        assert got == model, (scores, n_bins)


class TestTemperatureWeightProperties:
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        counts=st.lists(st.integers(1, 50), min_size=1, max_size=5),
        alpha=st.sampled_from([0.0, 0.5, 1.0]),
    )
    def test_normalised_and_ordered(self, spark, counts, alpha):
        from polars_pipe_spark.functions.sampling import temperature_weights

        rows = [(f"s{g}",) for g, n in enumerate(counts) for _ in range(n)]
        df = spark.createDataFrame(rows, "src string")
        out = {
            r["src"]: (r["n_rows"], r["weight"])
            for r in temperature_weights(df, "src", alpha=alpha).collect()
        }
        assert abs(sum(w for _, w in out.values()) - 1.0) < 1e-9
        denom = sum(n**alpha for n in counts)
        for g, n in enumerate(counts):
            assert out[f"s{g}"][0] == n
            assert abs(out[f"s{g}"][1] - (n**alpha) / denom) < 1e-9
