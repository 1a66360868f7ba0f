"""Differential property tests for the round-2 LLM operators: the Spark
result must equal a plain-Python model on arbitrary inputs (same pattern
as tests/core/test_aggregates.py)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polars_pipe_spark.functions.sampling import pack_sequences


class TestPackingProperties:
    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        toks=st.lists(st.integers(0, 500), min_size=1, max_size=20),
        bin_tokens=st.integers(1, 600),
    )
    def test_matches_greedy_model(self, spark, toks, bin_tokens):
        rows = [("s", i, n) for i, n in enumerate(toks)]
        df = spark.createDataFrame(rows, "source string, doc_id long, n_tok int")
        got = {
            r.doc_id: r.bin_id
            for r in pack_sequences(df, "n_tok", "doc_id", bin_tokens, "source").collect()
        }
        offset = 0
        for i, n in enumerate(toks):
            assert got[i] == offset // bin_tokens, (i, toks, bin_tokens)
            offset += n

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(toks=st.lists(st.integers(0, 100), min_size=1, max_size=12))
    def test_partition_independence(self, spark, toks):
        """Each source packs independently: interleaving a second source
        never changes the first source's bins."""
        rows = [("a", i, n) for i, n in enumerate(toks)]
        both = rows + [("b", 100 + i, n + 1) for i, n in enumerate(toks)]
        df1 = spark.createDataFrame(rows, "source string, doc_id long, n_tok int")
        df2 = spark.createDataFrame(both, "source string, doc_id long, n_tok int")
        g1 = {r.doc_id: r.bin_id for r in pack_sequences(df1, "n_tok", "doc_id", 64, "source").collect()}
        g2 = {
            r.doc_id: r.bin_id
            for r in pack_sequences(df2, "n_tok", "doc_id", 64, "source").collect()
            if r.doc_id < 100
        }
        assert g1 == g2


class TestQuantizationProperties:
    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        vec=st.lists(
            st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False, width=32),
            min_size=1,
            max_size=16,
        )
    )
    def test_matches_python_model(self, spark, vec):
        from polars_pipe_spark.functions.similarity import dequantize_vec, quantize_vec

        df = spark.createDataFrame([(1, vec)], "id int, v array<double>")
        got = df.select(dequantize_vec(quantize_vec("v")).alias("r")).first().r
        mn, mx = min(vec), max(vec)
        rng = (mx - mn) if mx > mn else 1.0
        exp = [mn + math.floor((x - mn) / rng * 255.0 + 0.5) * rng / 255.0 for x in vec]
        assert got == pytest.approx(exp, abs=0.0)  # bit-identical model


class TestStratifiedSampleProperties:
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        sizes=st.lists(st.integers(1, 12), min_size=1, max_size=4),
        k=st.integers(1, 6),
    )
    def test_exact_min_of_k_and_size(self, spark, sizes, k):
        from polars_pipe_spark.functions.sampling import stratified_sample

        rows = [(f"g{g}", g * 100 + i) for g, n in enumerate(sizes) for i in range(n)]
        df = spark.createDataFrame(rows, "g string, id long")
        out = stratified_sample(df, ["g"], "id", k=k)
        per = {r.g: r["count"] for r in out.groupBy("g").count().collect()}
        assert per == {f"g{g}": min(k, n) for g, n in enumerate(sizes)}


class TestEquidepthProperties:
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        vals=st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=4,
            max_size=60,
        ),
        n_buckets=st.integers(2, 6),
    )
    def test_partition_of_rows_and_ordered_ranges(self, spark, vals, n_buckets):
        from polars_pipe_spark.operators.aggregates import equidepth_histogram

        df = spark.createDataFrame([(v,) for v in vals], "x double")
        out = sorted(
            equidepth_histogram(df, "x", n_buckets=n_buckets).collect(),
            key=lambda r: r.bucket,
        )
        # every row lands in exactly one bucket…
        assert sum(r.n_rows for r in out) == len(vals)
        # …and bucket value-ranges are disjoint and ordered
        for lo_r, hi_r in zip(out, out[1:]):
            assert lo_r.hi <= hi_r.lo


class TestWeightedTopkProperties:
    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        weights=st.lists(
            st.floats(-5, 50, allow_nan=False, allow_infinity=False),
            min_size=1, max_size=15,
        ),
        k=st.integers(1, 6),
    )
    def test_sample_size_and_eligibility(self, spark, weights, k):
        """|sample| = min(k, #rows with weight > 0), and every sampled
        row has positive weight (the A-ES guard)."""
        from polars_pipe_spark.functions.sampling import weighted_topk

        rows = [(i, float(w)) for i, w in enumerate(weights)]
        df = spark.createDataFrame(rows, "key long, w double")
        got = weighted_topk(df, "key", "w", k).collect()
        eligible = [i for i, w in enumerate(weights) if w > 0]
        assert len(got) == min(k, len(eligible))
        assert all(weights[r.key] > 0 for r in got)


class TestSpanDedupProperties:
    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        texts=st.lists(
            st.lists(st.sampled_from("abcd"), min_size=0, max_size=12).map(" ".join),
            min_size=1, max_size=6,
        ),
        span=st.integers(1, 4),
    )
    def test_kept_spans_equal_distinct_spans(self, spark, texts, span):
        """Exactly one owner per distinct span: Σ n_kept == |distinct
        spans| and Σ n_spans == total spans, matching a Python model."""
        from polars_pipe_spark.functions.dedup import span_dedup

        df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
        out = span_dedup(df, "text", "doc_id", span_tokens=span).collect()
        model_spans, model_distinct = 0, set()
        for t in texts:
            toks = t.split() if t.strip() else []
            chunks = [" ".join(toks[i:i + span]) for i in range(0, len(toks), span)]
            model_spans += len(chunks)
            model_distinct.update(chunks)
        assert sum(r.n_spans for r in out) == model_spans
        assert sum(r.n_kept for r in out) == len(model_distinct)


class TestBm25Properties:
    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=8).map(" ".join),
            min_size=2, max_size=6,
        )
    )
    def test_scores_positive_and_only_matching_docs(self, spark, docs):
        from polars_pipe_spark.functions.retrieval import bm25_topk

        df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
        out = bm25_topk(df, "text", "doc_id", ["x"], k=50).collect()
        matching = {i for i, t in enumerate(docs) if "x" in t.split()}
        assert {r.doc_id for r in out} == matching
        assert all(float(r.bm25) > 0 for r in out)
