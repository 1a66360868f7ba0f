"""Property tests for the q196-q200 entry queries (containment near-dup,
MaxSim late interaction, EWMA, inverted index, path trigrams) at
sf0.001 — the DuckDB oracle pins exact values at sf0.01; these pin the
semantic invariants on the real code path."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_containment_bounds_and_orientation(spark):
    rows = entry.queries()["q196_containment_neardup"](spark, SF).collect()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        # containment >= 0.8 enforced; containment can never exceed 1
        assert 0.8 <= r["containment"] <= 1.0


def test_containment_prefix_filter_is_exact(spark):
    """Prefix filtering must lose NO pair vs the brute-force overlap join."""
    from pyspark.sql import functions as F
    from polars_pipe_spark.functions.text import shingles

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    grams = F.transform(
        F.array_distinct(shingles("text", 5)),
        lambda s: F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long"),
    )
    g = docs.select(F.col("doc_id").alias("id"), "source", grams.alias("gr"))
    brute = (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.source") == F.col("b.source")) & (F.col("a.id") < F.col("b.id")),
        )
        .withColumn("n_inter", F.size(F.array_intersect("a.gr", "b.gr")))
        .filter(
            5 * F.col("n_inter") >= 4 * F.least(F.size("a.gr"), F.size("b.gr"))
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "n_inter")
    )
    expect = {(r["id_a"], r["id_b"]): r["n_inter"] for r in brute.collect()}
    got = {
        (r["id_a"], r["id_b"]): r["n_inter"]
        for r in entry.queries()["q196_containment_neardup"](spark, SF).collect()
    }
    assert got == expect and expect


def test_maxsim_bounded_by_subvector_count(spark):
    rows = entry.queries()["q197_maxsim_late_interaction"](spark, SF).collect()
    assert rows
    by_q = {}
    for r in rows:
        # sum of 4 cosines, each in [-1, 1]
        assert -4.0 <= r["maxsim"] <= 4.0
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        # scores non-increasing with rank
        scores = [r["maxsim"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_ewma_within_window_value_range(spark):
    df = entry.queries()["q198_ewma_smoothing"](spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    lo, hi = ev.selectExpr("min(value)", "max(value)").first()
    rows = df.collect()
    assert len(rows) == ev.count()
    for r in rows:
        if r["ewma"] is not None:
            # a weighted average of observed values stays inside their range
            assert lo - 1e-6 <= r["ewma"] <= hi + 1e-6


def test_inverted_index_postings_sorted_and_capped(spark):
    rows = entry.queries()["q199_inverted_index"](spark, SF).collect()
    assert 0 < len(rows) <= 50
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        ps = r["posting_sample"]
        assert ps == sorted(ps)
        assert len(ps) == min(r["df"], 10)
        assert len(set(ps)) == len(ps)


def test_inverted_index_salted_merge_equals_direct_topk(spark):
    """The salted two-level top-k must equal the naive global answer."""
    from pyspark.sql import functions as F
    from polars_pipe_spark.functions.text import tokens

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    post = docs.select(
        F.explode(F.array_distinct(tokens("text"))).alias("token"), "doc_id"
    )
    direct = {
        r["token"]: (r["df"], r["sample"])
        for r in post.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.slice(F.array_sort(F.collect_list("doc_id")), 1, 10).alias("sample"),
        )
        .collect()
    }
    for r in entry.queries()["q199_inverted_index"](spark, SF).collect():
        assert direct[r["token"]] == (r["df"], r["posting_sample"])


def test_path_trigrams_counts_positive_sorted(spark):
    rows = entry.queries()["q200_event_path_trigrams"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(n > 0 for n in ns)


def test_lsh_precision_consistent_with_q25(spark):
    r = entry.queries()["q201_lsh_precision"](spark, SF).collect()[0]
    assert 0 < r["n_true"] <= r["n_candidates"]
    assert 0.0 < r["precision"] <= 1.0
    n_pairs = entry.queries()["q25_minhash_neardup"](spark, SF).count()
    assert r["n_true"] == n_pairs


def test_langid_confusion_partitions_corpus(spark):
    rows = entry.queries()["q202_langid_confusion"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == n_docs
    assert {r["lang_pred"] for r in rows} <= {"de", "en", "es", "fr", "unknown"}


def test_streaming_heavy_hitters_equals_batch(spark):
    got = {
        (r["token"], r["cnt"], r["total"])
        for r in entry.queries()["q203_streaming_heavy_hitters"](spark, SF).collect()
    }
    want = {
        (r["token"], r["cnt"], r["total"])
        for r in entry.queries()["q193_heavy_hitters"](spark, SF).collect()
    }
    assert got == want and want
