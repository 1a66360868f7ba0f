"""Unit tests for the round-4 session-3 operators: bloom-pruned join,
URL canonicalisation, grouped OLS, k-anonymity audit — each checked
against a plain-Python model on small hand-built frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_pipe_spark.operators.aggregates import grouped_ols
from polars_pipe_spark.operators.inspect import k_anonymity_report
from polars_pipe_spark.operators.joins import bloom_prune, bloom_prune_join
from polars_pipe_spark.functions.text import normalize_url, registrable_domain


class TestBloomPrune:
    @pytest.fixture()
    def sides(self, spark):
        left = spark.createDataFrame(
            [(i, f"p{i % 3}") for i in range(200)], "k long, tag string"
        )
        right = spark.createDataFrame([(i,) for i in range(0, 200, 25)], "rk long")
        return left, right

    def test_no_false_negatives(self, sides):
        left, right = sides
        pruned = bloom_prune(left, right, "k", "rk", n_buckets=64)
        kept = {r.k for r in pruned.collect()}
        assert set(range(0, 200, 25)) <= kept  # every true match survives

    def test_prunes_something(self, sides):
        left, right = sides
        pruned = bloom_prune(left, right, "k", "rk", n_buckets=64)
        # 8 build keys over 64 buckets: ~7/8 of probe rows should go
        assert pruned.count() < 200

    def test_join_equals_plain_join(self, sides):
        left, right = sides
        expect = sorted(
            (r.k, r.tag) for r in left.join(right, left.k == right.rk).collect()
        )
        got = sorted(
            (r.k, r.tag)
            for r in bloom_prune_join(left, right, "k", "rk", n_buckets=16).collect()
        )
        assert got == expect

    def test_key_arity_mismatch(self, sides):
        left, right = sides
        with pytest.raises(ValueError):
            bloom_prune(left, right, ["k"], ["rk", "rk"])


class TestNormalizeUrl:
    def norm(self, spark, raw):
        df = spark.createDataFrame([(raw,)], "u string")
        return df.select(normalize_url("u").alias("n")).collect()[0].n

    def test_full_canonicalisation(self, spark):
        raw = "HTTPS://WWW.Site.COM:443/Path/X?utm_source=a&z=1&a=2#frag"
        assert self.norm(spark, raw) == "https://site.com/Path/X?a=2&z=1"

    def test_http_default_port_and_empty_path(self, spark):
        assert self.norm(spark, "http://EXAMPLE.org:80") == "http://example.org/"

    def test_non_default_port_kept(self, spark):
        assert self.norm(spark, "http://a.io:8080/x") == "http://a.io:8080/x"

    def test_all_params_dropped(self, spark):
        assert (
            self.norm(spark, "https://a.io/p?utm_a=1&utm_b=2") == "https://a.io/p"
        )

    def test_port_strip_gated_on_scheme(self, spark):
        # :80 is http's default only — on https it is a REAL port and must
        # survive (r4 ADVICE: https://h:80/x must not merge with https://h/x)
        assert self.norm(spark, "https://h.io:80/x") == "https://h.io:80/x"
        assert self.norm(spark, "http://h.io:443/x") == "http://h.io:443/x"
        assert self.norm(spark, "ftp://h.io:80/x") == "ftp://h.io:80/x"

    def test_no_scheme_returns_null(self, spark):
        assert self.norm(spark, "example.com/path?a=1") is None

    def test_registrable_domain(self, spark):
        df = spark.createDataFrame(
            [("https://a.b.Example.com:9/x",), ("deep.sub.site.org",), ("io",)],
            "h string",
        )
        got = [r.d for r in df.select(registrable_domain("h").alias("d")).collect()]
        assert got == ["example.com", "site.org", "io"]


class TestGroupedOls:
    def test_against_python_model(self, spark):
        rows = [("g", x, 3 * x + 7 + (x % 2)) for x in range(1, 11)]
        df = spark.createDataFrame(rows, "g string, x long, y long")
        out = grouped_ols(df, ["g"], "x", "y").collect()[0]
        n = len(rows)
        sx = sum(r[1] for r in rows)
        sy = sum(r[2] for r in rows)
        sxy = sum(r[1] * r[2] for r in rows)
        sxx = sum(r[1] * r[1] for r in rows)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        assert out.n == n
        assert out.slope == pytest.approx(slope, abs=1e-12)
        assert out.intercept == pytest.approx(intercept, abs=1e-12)
        assert 0.99 < out.corr_r <= 1.0  # near-perfect line

    def test_degenerate_group_nulls(self, spark):
        df = spark.createDataFrame(
            [("g", 5, 1), ("g", 5, 9)], "g string, x long, y long"
        )
        out = grouped_ols(df, ["g"], "x", "y").collect()[0]
        assert out.slope is None and out.intercept is None and out.corr_r is None
        assert out.n == 2


class TestKAnonymity:
    def test_hand_computed(self, spark):
        rows = (
            [("n1", "A", i) for i in range(6)]  # class size 6, l=6
            + [("n1", "B", 1), ("n1", "B", 1)]  # size 2 (< k), l=1
            + [("n2", "A", 2)]  # size 1 (< k), l=1
        )
        df = spark.createDataFrame(rows, "nat string, seg string, bal long")
        out = k_anonymity_report(
            df, ["nat", "seg"], k=5, sensitive_col="bal"
        ).collect()[0]
        assert out.n_rows == 9
        assert out.n_classes == 3
        assert out.min_class_size == 1
        assert out.rows_below_k == 3
        assert out.min_l == 1
        assert out.below_k_ppm == 3 * 1_000_000 // 9

    def test_without_sensitive(self, spark):
        df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v long")
        row = k_anonymity_report(df, ["g"], k=1).collect()[0]
        assert row.rows_below_k == 0 and "min_l" not in row.asDict()


class TestPlanAndEquivalence:
    def test_bloom_probe_side_has_no_shuffle_before_filter(self, spark):
        """The probe side must be a map-side filter fed by a broadcast:
        a bloom_prune that shuffles the probe side before filtering has
        lost its reason to exist."""
        left = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        right = spark.read.parquet(
            "/root/testdata/sf0.001/customer.parquet"
        ).select("c_custkey")
        pruned = bloom_prune(left, right, "o_custkey", "c_custkey")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        # the only Exchange allowed is the 1-row bitmap aggregate /
        # broadcast — the probe FileScan must not sit under a hash
        # partitioning exchange
        probe_side = plan.split("BroadcastExchange")[0]
        assert "Exchange hashpartitioning" not in probe_side

    def test_domain_caps_matches_naive_window(self, spark):
        """q210's salted two-level selection must equal the one-reducer
        row_number form it replaces (brute-force pinned equivalence)."""
        import __spark_entry__ as e
        from pyspark.sql import Window
        from pyspark.sql import functions as FF

        got = sorted(
            (r.source, r.rank, r.doc_id, r.n_docs)
            for r in e.queries()["q210_domain_caps"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        )
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        w = Window.partitionBy("source").orderBy(
            FF.md5(FF.col("doc_id").cast("string")), FF.col("doc_id")
        )
        naive = (
            docs.select(
                "source",
                FF.row_number().over(w).cast("long").alias("rank"),
                "doc_id",
                FF.count(FF.lit(1))
                .over(Window.partitionBy("source"))
                .alias("n_docs"),
            )
            .filter(FF.col("rank") <= 20)
        )
        expect = sorted(
            (r.source, r.rank, r.doc_id, r.n_docs) for r in naive.collect()
        )
        assert got == expect


class TestKmeansExact:
    def test_against_python_model(self, spark):
        from polars_pipe_spark.functions.similarity import (
            _tdiv,
            kmeans_train_exact,
        )

        vecs = [
            (0, [0.0, 0.1]), (1, [10.0, 10.2]), (2, [0.2, -0.1]),
            (3, [9.8, 10.0]), (4, [0.1, 0.0]), (5, [10.1, 9.9]),
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        out = {
            r.cluster_id: r
            for r in kmeans_train_exact(
                df, "embedding", "vec_id", k=2, iterations=2
            ).collect()
        }

        # plain-Python replay of the same integer-lattice trajectory
        import struct as _s

        def f32(x):  # replicate the float32 storage round-trip
            return _s.unpack("f", _s.pack("f", x))[0]

        vm = {i: [round(f32(x) * 1_000_000) for x in v] for i, v in vecs}
        cents = [vm[0], vm[1]]
        for _ in range(2):
            assign = {}
            for i, v in vm.items():
                dists = [
                    sum((a - b) * (a - b) for a, b in zip(v, c)) for c in cents
                ]
                assign[i] = dists.index(min(dists))
            cents = [
                [
                    _tdiv(
                        sum(vm[i][d] for i in assign if assign[i] == j),
                        sum(1 for i in assign if assign[i] == j),
                    )
                    for d in range(2)
                ]
                for j in range(2)
            ]
        assign = {}
        for i, v in vm.items():
            dists = [sum((a - b) * (a - b) for a, b in zip(v, c)) for c in cents]
            assign[i] = dists.index(min(dists))
        for j in range(2):
            members = [i for i in assign if assign[i] == j]
            sse = sum(
                sum((a - b) * (a - b) for a, b in zip(vm[i], cents[j]))
                for i in members
            )
            assert out[j].n_vecs == len(members)
            assert list(out[j].centroid) == cents[j]
            assert out[j].mean_sse == _tdiv(sse, len(members))

    def test_too_few_rows(self, spark):
        from polars_pipe_spark.functions.similarity import kmeans_train_exact

        df = spark.createDataFrame(
            [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError):
            kmeans_train_exact(df, "embedding", "vec_id", k=4)

    def test_seed_shortfall_names_bad_vector_possibility(self, spark):
        # r7 ADVICE: with iterations >= 1, bad rows are excluded from
        # seeding, so the shortfall message must point at null /
        # wrong-length vectors rather than masking the data problem.
        from polars_pipe_spark.functions.similarity import kmeans_train_exact

        df = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, None), (2, [3.0])],
            "vec_id long, embedding array<float>",
        )
        with pytest.raises(ValueError, match="valid rows.*null or non-"):
            kmeans_train_exact(df, "embedding", "vec_id", k=3)
