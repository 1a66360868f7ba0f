"""Salted aggregation: identical results to direct groupBy, plus
hypothesis property tests for the expression compiler's declared
semantics (the reference declares hypothesis but never uses it —
SURVEY.md §5)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from polars_pipe_spark.operators.aggregates import salted_agg

SPARK = None


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    global SPARK
    SPARK = spark
    yield


class TestSaltedAgg:
    def test_matches_direct_groupby(self, spark):
        rows = [("hot", float(i)) for i in range(500)] + [("cold", 1.0), ("cold", 2.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        direct = {
            (r.k): (r.n, r.total, r.lo, r.hi)
            for r in df.groupBy("k")
            .agg(
                F.count("v").alias("n"),
                F.sum("v").alias("total"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
            )
            .collect()
        }
        salted = {
            (r.k): (r.n, r.total, r.lo, r.hi)
            for r in salted_agg(
                df,
                ["k"],
                {"n": ("count", "v"), "total": ("sum", "v"),
                 "lo": ("min", "v"), "hi": ("max", "v")},
                n_salts=8,
            ).collect()
        }
        assert direct == salted

    def test_spreads_hot_key(self, spark):
        df = spark.createDataFrame([("hot", 1.0)] * 200, "k string, v double")
        plan = salted_agg(df, ["k"], {"n": ("count", "v")})._jdf.queryExecution()
        # two-stage: two distinct grouping exchanges in the plan
        assert plan.executedPlan().toString().count("HashAggregate") >= 3

    def test_non_algebraic_rejected(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "k string, v double")
        with pytest.raises(KeyError, match="non-algebraic"):
            salted_agg(df, ["k"], {"m": ("median", "v")})


# --- hypothesis property tests --------------------------------------------
# One small Spark job per example is expensive — cap examples and disable
# the too-slow health check; the properties target DECLARED semantics
# (null-preserving clip, rule compiler vs python model).

_vals = st.lists(
    st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000)),
    min_size=1,
    max_size=8,
)


class TestExpressionProperties:
    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(vals=_vals, lo=st.integers(-100, 0), hi=st.integers(1, 100))
    def test_clip_matches_python_model(self, vals, lo, hi):
        from polars_pipe_spark.expressions import clip_expr

        df = SPARK.createDataFrame([(v,) for v in vals], "x int")
        got = [r.c for r in df.select(clip_expr("x", lo, hi).alias("c")).collect()]
        expected = [None if v is None else max(lo, min(v, hi)) for v in vals]
        assert sorted(got, key=str) == sorted(expected, key=str)

    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(vals=_vals, threshold=st.integers(-1000, 1000))
    def test_gt_rule_matches_python_model(self, vals, threshold):
        from polars_pipe_spark.expressions import build_rule_expr

        df = SPARK.createDataFrame([(v,) for v in vals], "x int")
        got = sorted(
            r.x for r in df.filter(build_rule_expr("x", "gt", threshold)).collect()
        )
        expected = sorted(v for v in vals if v is not None and v > threshold)
        assert got == expected

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        rows=st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(-100, 100)),
                st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
            ),
            min_size=1,
            max_size=10,
        ),
        threshold=st.integers(-100, 100),
        allowed=st.sets(st.sampled_from(["a", "b", "c"]), min_size=1),
    )
    def test_validate_split_matches_python_model(self, rows, threshold, allowed):
        """Differential test: validate_df vs a pure-Python rule model —
        partition totality (valid+invalid == input) and per-row reasons."""
        from polars_pipe_spark.operators.validation import (
            parse_validation_config,
            validate_df,
        )

        df = SPARK.createDataFrame(rows, "x int, s string")
        rules = parse_validation_config(
            {"x big": ["x", "gt", threshold], "s ok": ["s", "is_in", sorted(allowed)]}
        )
        valid, invalid = validate_df(df, rules)
        v_rows = [(r.x, r.s) for r in valid.collect()]
        i_rows = {(r.x, r.s, r.error_reason) for r in invalid.collect()}

        def model(x, s):
            # Reference parity: a NULL rule outcome (null operand) is a
            # PASS — only a definite False fails (see validation.py).
            fails = []
            if x is not None and not (x > threshold):
                fails.append("x big")
            if s is not None and s not in allowed:
                fails.append("s ok")
            return ",".join(fails)

        def nkey(t):  # None-safe total order (nulls can be valid now)
            x, s = t
            return (x is None, x if x is not None else 0, s is None, s or "")

        exp_valid = sorted(((x, s) for x, s in rows if model(x, s) == ""), key=nkey)
        exp_invalid = {(x, s, model(x, s)) for x, s in rows if model(x, s)}
        assert sorted(v_rows, key=nkey) == exp_valid
        assert i_rows == exp_invalid
        assert len(v_rows) + invalid.count() == len(rows)


class TestRobustStats:
    def test_median_and_mad_exact(self, spark):
        from polars_pipe_spark.operators.aggregates import robust_group_stats

        df = spark.createDataFrame(
            [("a", v) for v in [1, 2, 3, 4, 100]] + [("b", v) for v in [10, 20]],
            "g string, x long",
        )
        out = {r.g: (r.n, r.med, r.mad) for r in
               robust_group_stats(df, ["g"], "x").collect()}
        # a: median 3, deviations [2,1,0,1,97] -> MAD 1 (outlier-immune)
        assert out["a"] == (5, 3.0, 1.0)
        # b: even count -> interpolated median 15, deviations [5,5] -> 5
        assert out["b"] == (2, 15.0, 5.0)

    def test_mad_vs_std_outlier_robustness(self, spark):
        from polars_pipe_spark.operators.aggregates import robust_group_stats

        clean = [("g", float(v)) for v in range(100)]
        dirty = clean + [("g", 1e9)]
        df = spark.createDataFrame(dirty, "g string, x double")
        r = robust_group_stats(df, ["g"], "x").collect()[0]
        assert r.mad < 50  # one outlier barely moves MAD


class TestEquidepthHistogram:
    def test_quartiles_exact(self, spark):
        from polars_pipe_spark.operators.aggregates import equidepth_histogram

        df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
        out = {r.bucket: (r.n_rows, r.lo, r.hi) for r in
               equidepth_histogram(df, "x", n_buckets=4).collect()}
        # percentile_disc bounds at 25/50/75 -> 4 buckets of 25 rows
        assert {b: n for b, (n, _, _) in out.items()} == {0: 25, 1: 25, 2: 25, 3: 25}
        assert out[0][1] == 1.0 and out[3][2] == 100.0
        # bucket edges: bound value itself goes to the LOWER bucket (x <= bound)
        assert out[0][2] == 25.0 and out[1][1] == 26.0

    def test_skewed_data_still_balanced(self, spark):
        from polars_pipe_spark.operators.aggregates import equidepth_histogram

        # heavy tail: equi-WIDTH would put ~all rows in bucket 0
        df = spark.createDataFrame([(1.001 ** i,) for i in range(2000)], "x double")
        counts = [r.n_rows for r in
                  equidepth_histogram(df, "x", n_buckets=10).collect()]
        assert max(counts) - min(counts) <= 2


class TestStratifiedSample:
    def test_exact_k_and_determinism(self, spark):
        from polars_pipe_spark.functions.sampling import stratified_sample

        df = spark.createDataFrame(
            [(f"s{i % 3}", i) for i in range(300)], "g string, id long"
        )
        a = stratified_sample(df, ["g"], "id", k=7)
        assert {r.g: 1 for r in a.collect()}  # runs
        per = a.groupBy("g").count().collect()
        assert all(r["count"] == 7 for r in per)
        # repartition-stable: same winners under a different layout
        b = stratified_sample(df.repartition(13), ["g"], "id", k=7)
        assert sorted((r.g, r.id) for r in a.collect()) == \
               sorted((r.g, r.id) for r in b.collect())

    def test_small_stratum_keeps_all(self, spark):
        from polars_pipe_spark.functions.sampling import stratified_sample

        df = spark.createDataFrame([("tiny", 1), ("tiny", 2)], "g string, id long")
        assert stratified_sample(df, ["g"], "id", k=5).count() == 2


class TestSkewReport:
    def test_hot_key_flagged_with_salt_suggestion(self, spark):
        from polars_pipe_spark.operators.aggregates import skew_report

        rows = [("hot", i) for i in range(80)] + [
            (f"k{j}", i) for j in range(9) for i in range(8)
        ]
        df = spark.createDataFrame(rows, "k string, v long")
        out = skew_report(df, ["k"], top_n=3).collect()
        top = out[0]
        assert top.k == "hot" and top.n_rows == 80
        # median key has 8 rows -> hot is 10x the median, salt 10 ways
        assert top.skew_ratio == 10.0 and top.suggested_salts == 10
        assert abs(top.row_share - 80 / 152) < 1e-12
        assert top.n_keys == 10 and top.total_rows == 152
        # remaining rows are ordinary keys with ratio 1
        assert all(r.suggested_salts == 1 for r in out[1:])


class TestGroupedPandasStats:
    def test_quartiles_match_model(self, spark):
        from polars_pipe_spark.operators.aggregates import grouped_pandas_stats

        df = spark.createDataFrame(
            [("a", v) for v in [1, 2, 3, 4, 5]] + [("b", v) for v in [10, 20]],
            "g string, x long",
        )
        out = {r.g: (r.n, r.q1, r.median, r.q3, r.iqr) for r in
               grouped_pandas_stats(df, ["g"], "x").collect()}
        assert out["a"] == (5, 2.0, 3.0, 4.0, 2.0)
        assert out["b"] == (2, 12.5, 15.0, 17.5, 5.0)


class TestWeightedQuantiles:
    def test_against_python_model(self, spark):
        from polars_pipe_spark.operators.aggregates import weighted_quantiles

        rows = [(10, 1), (20, 3), (30, 2), (40, 10), (50, 4)]
        df = spark.createDataFrame(rows, "v long, w long")
        res = weighted_quantiles(df, "v", "w", [0.0, 0.25, 0.5, 0.9, 1.0])
        expanded = sorted(v for v, w in rows for _ in range(w))
        W = len(expanded)
        for q, (rank, val) in res.items():
            assert rank == int((W - 1) * q)
            assert val == expanded[rank], (q, rank, val)

    def test_narrowing_path_matches_direct(self, spark):
        """Force multi-round narrowing (tiny direct_threshold) and pin
        it to the single-collect answer."""
        from polars_pipe_spark.operators.aggregates import weighted_quantiles

        rows = [(i * 7 % 1000, 1 + i % 5) for i in range(500)]
        df = spark.createDataFrame(rows, "v long, w long")
        direct = weighted_quantiles(df, "v", "w", [0.5], direct_threshold=100_000)
        narrow = weighted_quantiles(
            df, "v", "w", [0.5], n_buckets=8, direct_threshold=20
        )
        assert direct == narrow

    def test_batched_direct_buckets_match_model(self, spark):
        """r14: several quantiles at once with a fine histogram (every
        bucket under direct_threshold) resolve via ONE shared
        cumulative-weight window job — values must match the expanded
        multiset model, including targets landing inside a heavy
        repeated-value run (the ROWS-frame tie case)."""
        from polars_pipe_spark.operators.aggregates import weighted_quantiles

        rows = [(i * 7 % 1000, 1 + i % 5) for i in range(500)] + [(400, 40)] * 6
        df = spark.createDataFrame(rows, "v long, w long")
        got = weighted_quantiles(
            df, "v", "w", [0.1, 0.25, 0.5, 0.75, 0.9],
            n_buckets=64, direct_threshold=60,
        )
        expanded = sorted(v for v, w in rows for _ in range(w))
        W = len(expanded)
        for q, (rank, val) in got.items():
            assert rank == int((W - 1) * q)
            assert val == expanded[rank], (q, rank, val)

    def test_empty_and_null(self, spark):
        from polars_pipe_spark.operators.aggregates import weighted_quantiles

        df = spark.createDataFrame([(None, 3), (5, None)], "v long, w long")
        assert weighted_quantiles(df, "v", "w", [0.5]) == {0.5: (0, None)}


class TestPercentileCont:
    def test_percentile_cont_bitwise_matches_spark(self, spark):
        """r14: percentile_cont replaces single-reducer F.percentile at
        call sites (q56) — the driver-side interpolation must be
        BIT-IDENTICAL to the aggregate, on both the direct path and the
        forced histogram-narrowing path."""
        from pyspark.sql import functions as F

        from polars_pipe_spark.operators.aggregates import percentile_cont

        vals = [((i * 37) % 997) / 7.0 for i in range(500)]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        ps = [0.01, 0.25, 0.5, 0.9, 0.99]
        want = df.agg(
            *[F.percentile("x", p).alias(f"p{i}") for i, p in enumerate(ps)]
        ).first()
        got = percentile_cont(df, "x", ps)
        narrow = percentile_cont(df, "x", ps, n_buckets=16, direct_threshold=30)
        for i, p in enumerate(ps):
            assert got[p] == want[f"p{i}"], p
            assert narrow[p] == want[f"p{i}"], p

    def test_percentile_cont_empty(self, spark):
        from polars_pipe_spark.operators.aggregates import percentile_cont

        empty = spark.createDataFrame([], "x double")
        assert percentile_cont(empty, "x", [0.5]) == {0.5: None}

    def test_grouped_percentile_cont_bitwise_matches_spark(self, spark):
        """Grouped form (q62): shared-job selection must be bit-identical
        to per-group F.percentile, across small groups (whole-group
        window path), narrowing-forced groups, and a constant-valued
        group."""
        from pyspark.sql import functions as F

        from polars_pipe_spark.operators.aggregates import (
            grouped_percentile_cont,
        )

        rows = (
            [("a", ((i * 37) % 997) / 7.0) for i in range(400)]
            + [("b", float(i)) for i in range(57)]
            + [("c", 5.0)] * 40
        )
        df = spark.createDataFrame(rows, "g string, x double")
        ps = [0.5, 0.9]
        want = {
            r["g"]: (r["m"], r["p"])
            for r in df.groupBy("g")
            .agg(
                F.percentile("x", 0.5).alias("m"),
                F.percentile("x", 0.9).alias("p"),
            )
            .collect()
        }
        for kwargs in (
            {},
            {"n_buckets": 16, "direct_threshold": 30},
        ):
            got = grouped_percentile_cont(df, ["g"], "x", ps, **kwargs)
            for gk, (m, p) in want.items():
                assert got[(gk,)][0.5] == m, (gk, kwargs)
                assert got[(gk,)][0.9] == p, (gk, kwargs)
