"""Property-based tests (hypothesis) for the round-5 operators: image
codecs, Count-Min, HLL, SemDeDup ledger, BPE encode. Spark jobs are slow
per-example, so each property runs few examples with deadline disabled —
the VALUE is the generator exploring shapes (odd widths, degenerate
streams, duplicate-heavy splits) a hand-written case list misses.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from polars_pipe_spark.functions import multimodal as mm

SPARK_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


class TestImageCodecProperties:
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 7),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=50, deadline=None)
    def test_bmp_roundtrip_any_shape(self, w, h, seed):
        """decode(encode(px)) recovers dims/channels and the exact
        integer-luma mean for ANY dims (row padding 0-3 bytes) and ANY
        pixel content."""
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        gw, gh, ch, luma = mm.decode_image(mm.encode_bmp(w, h, px))
        lum = px.astype("int64") @ np.array([299, 587, 114], dtype="int64")
        assert (gw, gh, ch) == (w, h, 3)
        assert luma == int(lum.sum()) / (255000.0 * w * h)

    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 7),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=50, deadline=None)
    def test_ppm_and_bmp_agree(self, w, h, seed):
        """The two codecs are decode-equivalent on identical pixels."""
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert mm.decode_image(mm.encode_bmp(w, h, px)) == mm.decode_image(
            mm.encode_ppm(w, h, px)
        )


class TestSketchProperties:
    @given(data=st.lists(st.integers(0, 30), min_size=1, max_size=60))
    @settings(**SPARK_SETTINGS)
    def test_cms_never_undercounts(self, spark, data):
        from polars_pipe_spark.functions.integrity import count_min_estimates

        df = spark.createDataFrame([(x,) for x in data], "k long")
        probes = spark.createDataFrame(
            [(x,) for x in set(data)], "k long"
        )
        out = count_min_estimates(df, "k", probes, width=8, depth=2).collect()
        assert len(out) == len(set(data))
        for r in out:
            assert r.est >= r.exact
            assert r.never_undercounts

    @given(
        data=st.lists(st.integers(0, 1000), min_size=1, max_size=80),
        cut=st.integers(0, 80),
    )
    @settings(**SPARK_SETTINGS)
    def test_hll_split_merge_law(self, spark, data, cut):
        """The sketch of the whole equals the register-wise max of the
        parts — asserted through s_scaled/zero-regs equality of
        whole vs (union of any split), which only holds if registers
        merge by max."""
        from polars_pipe_spark.functions.integrity import hll_cardinality

        cut = min(cut, len(data))
        whole = spark.createDataFrame([(x,) for x in data], "k long")
        resplit = spark.createDataFrame(
            [(x,) for x in data[:cut]], "k long"
        ).unionAll(spark.createDataFrame([(x,) for x in data[cut:]], "k long")) \
            if 0 < cut < len(data) else whole
        a = hll_cardinality(whole, "k", m=16).collect()[0]
        b = hll_cardinality(resplit, "k", m=16).collect()[0]
        assert (a.s_scaled, a.n_zero_regs, a.est) == (
            b.s_scaled, b.n_zero_regs, b.est,
        )


class TestLedgerProperties:
    @given(
        n=st.integers(2, 12),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(**SPARK_SETTINGS)
    def test_semantic_dedup_ledger_conserves_members(self, spark, n, seed):
        """members = dropped + survivors per cluster, and members sum to
        the valid-vector count, for any random corpus."""
        from polars_pipe_spark.functions.dedup import semantic_dedup_ledger

        rng = np.random.default_rng(seed)
        rows = [
            (i, [float(x) for x in rng.normal(size=4)]) for i in range(n)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cents = [[1000, 0, 0, 0], [0, 1000, 0, 0]]
        out = semantic_dedup_ledger(
            df, "embedding", "vec_id", cents, threshold=0.8, n_planes=2
        ).collect()
        assert all(r.n_members == r.n_dropped + r.n_survivors for r in out)
        assert sum(r.n_members for r in out) == n
        assert all(r.n_survivors >= 1 for r in out)  # min-id always kept


class TestBpeEncodeProperties:
    @given(
        words=st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            min_size=1,
            max_size=8,
        )
    )
    @settings(**SPARK_SETTINGS)
    def test_symbol_count_bounds(self, spark, words):
        from polars_pipe_spark.functions.text import bpe_encode_stats

        df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
        out = bpe_encode_stats(df, "text", "doc_id", n_merges=3).collect()
        assert len(out) == 1
        r = out[0]
        assert r.n_words == len(words)
        assert r.n_chars == sum(len(w) for w in words)
        assert r.n_words <= r.n_bpe_symbols <= r.n_chars


class TestWavCodecProperties:
    @given(
        samples=st.lists(
            st.integers(-32768, 32767), min_size=1, max_size=200
        ),
        rate=st.sampled_from([4000, 8000, 16000, 44100]),
    )
    @settings(max_examples=50, deadline=None)
    def test_wav_roundtrip_any_samples(self, samples, rate):
        import math

        gr, n, dur, rms = mm.decode_wav(mm.encode_wav(samples, rate))
        assert (gr, n) == (rate, len(samples))
        assert dur == len(samples) * 1000 // rate
        assert rms == math.sqrt(
            sum(s * s for s in samples) / len(samples)
        )


class TestStreakProperties:
    @given(
        days=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    )
    @settings(**SPARK_SETTINGS)
    def test_islands_match_python_model(self, spark, days):
        """The rn-difference islands recover exactly the runs a direct
        scan of the sorted distinct day set finds."""
        import __spark_entry__ as entry
        from pyspark.sql import functions as F

        uniq = sorted(set(days))
        runs, cur = [], 1
        for a, b in zip(uniq, uniq[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        longest = max(runs)

        df = spark.createDataFrame(
            [(1, d) for d in days], "user_id long, day long"
        )
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("day")
        got = (
            df.distinct()
            .withColumn("grp", F.col("day") - F.row_number().over(w))
            .groupBy("user_id", "grp")
            .count()
            .groupBy("user_id")
            .agg(F.max("count").alias("longest"))
            .collect()[0]
            .longest
        )
        assert got == longest
