"""Coverage for the convenience/introspection API surface that queries
don't exercise directly: dummy_config, plan introspection helpers,
salted mean, and the two-step MinHash candidate/verify building blocks
(superseded in the hot path by minhash_near_dups but kept as the
composable form)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_pipe_spark.config import TransformConfig, dummy_config
from polars_pipe_spark.functions.dedup import jaccard_pairs, minhash_lsh_candidates
from polars_pipe_spark.operators.aggregates import mean_via_salted
from polars_pipe_spark.plans.introspect import join_strategies


def test_dummy_config_is_valid_and_overridable(tmp_path):
    cfg = dummy_config(
        "/root/testdata/sf0.001/customer.parquet",
        str(tmp_path),
        process_name="t",
        validation={"v": ["c_acctbal", "gt", -1e9]},
    )
    parsed = TransformConfig.from_dict(cfg.get("transformations", {}))
    assert cfg["process_name"] == "t" and parsed is not None


def test_join_strategies_lists_outermost_first(spark):
    small = spark.range(10).withColumnRenamed("id", "k")
    big = spark.range(1000).withColumnRenamed("id", "k2")
    j = big.join(F.broadcast(small), big.k2 == small.k)
    assert join_strategies(j) == ["BroadcastHashJoin"]


def test_mean_via_salted_matches_plain_mean(spark):
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(10)] + [("b", 5.0)], "g string, v double"
    )
    got = {
        r.g: r.mean for r in mean_via_salted(df, ["g"], "v").collect()
    }
    assert got["a"] == sum(range(10)) / 10 and got["b"] == 5.0


def test_minhash_candidates_then_exact_jaccard(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different words entirely unrelated text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = minhash_lsh_candidates(df, "text", "doc_id")
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    assert all(a < b for a, b in pairs)
    scored = jaccard_pairs(df, cand, "text", "doc_id").collect()
    for r in scored:
        assert 0.0 <= r.jaccard <= 1.0
        if (r.id_a, r.id_b) == (0, 1):
            assert r.jaccard > 0.5  # near-dup pair scores high
