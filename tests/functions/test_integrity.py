"""Integrity operators: order-invariant checksums, split-leakage audit,
exact heavy hitters (functions/integrity.py).

Each test pins the property the operator exists for: the checksum must be
invariant under physical reordering and sensitive to any cell change; the
leakage audit must find a planted cross-split duplicate and stay silent
without one; heavy hitters must be the exact threshold set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_pipe_spark.functions.integrity import (
    heavy_hitters,
    row_fingerprint_int,
    split_leakage,
    table_checksum,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, body string, split string")


def test_checksum_order_invariant(spark):
    rows = [(i, f"text-{i}", "train") for i in range(50)]
    df = _docs(spark, rows)
    shuffled = _docs(spark, list(reversed(rows))).repartition(7)
    a = table_checksum(df, ["id", "body"], "t").collect()[0]
    b = table_checksum(shuffled, ["id", "body"], "t").collect()[0]
    assert a["checksum"] == b["checksum"]
    assert a["n_rows"] == b["n_rows"] == 50


def test_checksum_detects_single_cell_change(spark):
    rows = [(i, f"text-{i}", "train") for i in range(50)]
    mutated = rows[:20] + [(20, "text-20-CORRUPT", "train")] + rows[21:]
    a = table_checksum(_docs(spark, rows), ["id", "body"], "t").collect()[0]
    b = table_checksum(_docs(spark, mutated), ["id", "body"], "t").collect()[0]
    assert a["checksum"] != b["checksum"]


def test_checksum_null_vs_empty_distinct(spark):
    a = _docs(spark, [(1, None, "x")])
    b = _docs(spark, [(1, "", "x")])
    ca = table_checksum(a, ["id", "body"], "t").collect()[0]["checksum"]
    cb = table_checksum(b, ["id", "body"], "t").collect()[0]["checksum"]
    assert ca != cb


def test_row_fingerprint_range(spark):
    df = _docs(spark, [(1, "a", "x"), (2, "b", "y")])
    vals = [r[0] for r in df.select(row_fingerprint_int("id", "body")).collect()]
    assert all(0 <= v < (1 << 48) for v in vals)
    assert len(set(vals)) == 2


def test_split_leakage_finds_planted_dup(spark):
    rows = [(i, f"unique-{i}", "train" if i % 2 else "test") for i in range(20)]
    rows += [(100, "LEAKED", "train"), (101, "LEAKED", "test"), (102, "LEAKED", "test")]
    df = _docs(spark, rows).withColumn("fp", F.md5("body"))
    out = split_leakage(df, "fp", "split").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["split_a"], r["split_b"]) == ("test", "train")
    assert r["n_shared_fingerprints"] == 1
    # 2 test docs + 1 train doc carry the leaked fingerprint
    assert r["n_leaked_docs"] == 3


def test_split_leakage_clean_corpus_empty(spark):
    rows = [(i, f"unique-{i}", "train" if i % 2 else "test") for i in range(20)]
    df = _docs(spark, rows).withColumn("fp", F.md5("body"))
    assert split_leakage(df, "fp", "split").count() == 0


def test_heavy_hitters_exact_threshold(spark):
    # 1000 tokens: 'hot' x 20 (2% = 20000 ppm), 'warm' x 1 (1000 ppm,
    # NOT above the strict threshold), filler unique tokens
    toks = ["hot"] * 20 + ["warm"] + [f"t{i}" for i in range(979)]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    out = {r["token"]: r for r in heavy_hitters(df, "token", threshold_ppm=1000).collect()}
    assert "hot" in out and out["hot"]["cnt"] == 20 and out["hot"]["total"] == 1000
    # strict inequality: exactly-at-threshold is excluded
    assert "warm" not in out


class TestCountMinSketch:
    def test_grid_mass_and_estimates(self, spark):
        from polars_pipe_spark.functions.integrity import (
            count_min_estimates,
            count_min_sketch,
        )

        rows = [("a",)] * 10 + [("b",)] * 3 + [("c",)] * 1
        df = spark.createDataFrame(rows, "k string")
        grid = count_min_sketch(df, "k", width=16, depth=3).collect()
        # every row of the grid holds the full stream mass
        by_row = {}
        for r in grid:
            by_row[r.row] = by_row.get(r.row, 0) + r.cnt
        assert by_row == {0: 14, 1: 14, 2: 14}

        probes = spark.createDataFrame([("a",), ("b",), ("zz",)], "k string")
        est = {
            r.key: r
            for r in count_min_estimates(df, "k", probes, width=16, depth=3).collect()
        }
        assert est["a"].exact == 10 and est["a"].est >= 10
        assert est["b"].exact == 3 and est["b"].est >= 3
        assert est["zz"].exact == 0 and est["zz"].est >= 0
        assert all(r.never_undercounts for r in est.values())

    def test_sketch_is_mergeable(self, spark):
        """CMS of a union equals the cell-wise sum of the parts — the
        property that makes per-partition/per-day sketches combinable."""
        from polars_pipe_spark.functions.integrity import count_min_sketch

        d1 = spark.createDataFrame([("a",), ("b",), ("a",)], "k string")
        d2 = spark.createDataFrame([("a",), ("c",)], "k string")
        whole = {
            (r.row, r.bucket): r.cnt
            for r in count_min_sketch(d1.unionAll(d2), "k", 8, 2).collect()
        }
        parts = {}
        for d in (d1, d2):
            for r in count_min_sketch(d, "k", 8, 2).collect():
                parts[(r.row, r.bucket)] = parts.get((r.row, r.bucket), 0) + r.cnt
        assert whole == parts


class TestHllRegisters:
    def test_estimate_close_and_registers_merge(self, spark):
        from polars_pipe_spark.functions.integrity import hll_cardinality

        df = spark.createDataFrame([(i % 500,) for i in range(2000)], "k long")
        r = hll_cardinality(df, "k", m=64).collect()[0]
        assert r.n_exact == 500
        # 64 registers -> ~13% std error; allow 3 sigma
        assert 300 < r.est < 700
        assert r.m == 64

    def test_duplicates_do_not_change_sketch(self, spark):
        """Register maxima are set-functions: the multiset multiplicity
        must not move the estimate (the property exact counting lacks)."""
        from polars_pipe_spark.functions.integrity import hll_cardinality

        base = spark.createDataFrame([(i,) for i in range(100)], "k long")
        dup = base.unionAll(base).unionAll(base)
        a = hll_cardinality(base, "k", m=64).collect()[0]
        b = hll_cardinality(dup, "k", m=64).collect()[0]
        assert (a.s_scaled, a.n_zero_regs, a.est) == (
            b.s_scaled, b.n_zero_regs, b.est,
        )
        assert a.n_exact == b.n_exact == 100

    def test_small_range_linear_counting(self, spark):
        from polars_pipe_spark.functions.integrity import hll_cardinality

        df = spark.createDataFrame([(i,) for i in range(5)], "k long")
        r = hll_cardinality(df, "k", m=64).collect()[0]
        assert r.n_zero_regs >= 59  # most registers untouched
        assert 3 <= r.est <= 8  # linear counting keeps it near 5


class TestSketchGuards:
    def test_cms_rejects_degenerate_grid(self, spark):
        from polars_pipe_spark.functions.integrity import count_min_sketch

        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError, match="width"):
            count_min_sketch(df, "k", width=0, depth=2)

    def test_hll_rejects_zero_registers(self, spark):
        from polars_pipe_spark.functions.integrity import (
            hll_cardinality,
            hll_cardinality_by,
        )

        df = spark.createDataFrame([(1, "a")], "k long, g string")
        with pytest.raises(ValueError, match="m="):
            hll_cardinality(df, "k", m=0)
        with pytest.raises(ValueError, match="m="):
            hll_cardinality_by(df, "g", "k", m=0)
