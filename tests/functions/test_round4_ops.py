"""Round-4 operators: BPE pair counting, temperature mixture weights,
incremental dedup, funnel conversion, blocked fuzzy join, quality bins.

Each is checked against a hand-computed model on tiny frames (the
reference's test strategy — SURVEY.md §5: small exact fixtures, no
randomness)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_char_pair_counts(spark):
    from polars_pipe_spark.functions.text import char_pair_counts

    df = spark.createDataFrame([("ab ab x abc",), ("",)], "text string")
    # tokens: ab, ab, x, abc → pairs ab, ab, ab, bc ("x" has none)
    got = {r["pair"]: r["n"] for r in char_pair_counts(df, "text").collect()}
    assert got == {"ab": 3, "bc": 1}


def test_char_pair_counts_normalises_case_and_whitespace(spark):
    from polars_pipe_spark.functions.text import char_pair_counts

    df = spark.createDataFrame([("AB   aB\n",)], "text string")
    got = {r["pair"]: r["n"] for r in char_pair_counts(df, "text").collect()}
    assert got == {"ab": 2}


def test_temperature_weights_alpha_half_and_one(spark):
    from polars_pipe_spark.functions.sampling import temperature_weights

    df = spark.createDataFrame(
        [("a",)] * 9 + [("b",)] * 1, "src string"
    )
    out = {
        r["src"]: (r["n_rows"], r["weight"])
        for r in temperature_weights(df, "src", alpha=0.5).collect()
    }
    assert out["a"][0] == 9 and out["b"][0] == 1
    # sqrt weighting: 3/(3+1), 1/(3+1)
    assert out["a"][1] == pytest.approx(0.75)
    assert out["b"][1] == pytest.approx(0.25)

    natural = {
        r["src"]: r["weight"]
        for r in temperature_weights(df, "src", alpha=1.0).collect()
    }
    assert natural["a"] == pytest.approx(0.9)
    # weights always normalise to 1
    assert sum(natural.values()) == pytest.approx(1.0)


def test_temperature_weights_budget_allocation(spark):
    from polars_pipe_spark.functions.sampling import temperature_weights

    df = spark.createDataFrame([("a",)] * 4 + [("b",)] * 1, "src string")
    out = {
        r["src"]: r["target_rows"]
        for r in temperature_weights(df, "src", alpha=0.5, budget=300).collect()
    }
    # sqrt: 2 vs 1 → 200 vs 100
    assert out == {"a": 200, "b": 100}


def test_incremental_dedup_statuses(spark):
    from polars_pipe_spark.functions.dedup import incremental_dedup
    from polars_pipe_spark.functions.text import normalize_text

    batch = spark.createDataFrame(
        [
            (1, "brand new doc"),
            (2, "Already Indexed"),
            (3, "repeated in batch"),
            (4, "repeated in batch"),
        ],
        "doc_id long, text string",
    )
    index = spark.createDataFrame(
        [("already indexed",)], "text string"
    ).select(F.md5(normalize_text("text")).alias("fingerprint"))
    got = {
        r["doc_id"]: r["dedup_status"]
        for r in incremental_dedup(batch, index, "text", "doc_id").collect()
    }
    assert got == {
        1: "new_unique",
        2: "dup_of_index",  # normalisation folds case before fingerprinting
        3: "new_unique",
        4: "dup_within_batch",
    }


def test_funnel_counts_ordering_semantics(spark):
    from polars_pipe_spark.operators.windows import funnel_counts

    rows = [
        # u1 converts fully: view@1 → click@2 → buy@3
        (1, 1, "view"), (1, 2, "click"), (1, 3, "buy"),
        # u2: click BEFORE first view → click stage must not count
        (2, 2, "click"), (2, 5, "view"),
        # u3: view then buy but no click → chain breaks at click
        (3, 1, "view"), (3, 2, "buy"),
        # u4: no view at all
        (4, 1, "click"), (4, 2, "buy"),
    ]
    df = spark.createDataFrame(
        [(u, float(t), s) for u, t, s in rows], "uid long, ts double, stage string"
    )
    out = {
        r["stage"]: r["n_converted"]
        for r in funnel_counts(df, "uid", "ts", "stage", ["view", "click", "buy"]).collect()
    }
    assert out == {"view": 3, "click": 1, "buy": 1}


def test_funnel_counts_stage_order_column(spark):
    from polars_pipe_spark.operators.windows import funnel_counts

    df = spark.createDataFrame([(1, 1.0, "a")], "uid long, ts double, stage string")
    out = funnel_counts(df, "uid", "ts", "stage", ["a", "b"]).collect()
    assert [(r["stage_idx"], r["stage"]) for r in out] == [(0, "a"), (1, "b")]
    assert [r["n_converted"] for r in out] == [1, 0]


def test_fuzzy_join_blocks_and_distance(spark):
    from polars_pipe_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame(
        [("smith", "x"), ("smyth", "x"), ("jones", "y")], "name string, blk string"
    )
    right = spark.createDataFrame(
        [("smith", "x"), ("jonez", "y"), ("smith", "y")], "rname string, blk string"
    )
    out = fuzzy_join(left, right, "name", "rname", "blk", "blk", max_dist=1)
    got = {(r["left_key"], r["right_key"], r["edit_dist"]) for r in out.collect()}
    # cross-block smith/smith (y) must NOT pair with block-x smiths
    assert got == {
        ("smith", "smith", 0),
        ("smyth", "smith", 1),
        ("jones", "jonez", 1),
    }
    assert set(out.columns) == {"block_key", "left_key", "right_key", "edit_dist"}


def test_fuzzy_join_deletion_signatures_lossless(spark):
    """r9: candidates now come from (block, ≤k-deletion signature)
    equi-joins — property-check losslessness against the brute-force
    lev≤k join on names mutated by every edit kind (substitution,
    insertion, deletion, double edits, and far-away strings)."""
    from polars_pipe_spark.operators.joins import fuzzy_join

    base = ["alpha-record-17", "beta-record-204", "gamma-entry-9"]
    lefts = [(n, "b") for n in base]
    rights = [
        ("alpha-recXrd-17", "b"),   # substitution (lev 1)
        ("alpha-ecord-17", "b"),    # deletion (lev 1)
        ("alpha-record-917", "b"),  # insertion (lev 1)
        ("beta-recXrd-20", "b"),    # sub + del (lev 2)
        ("gamXa-enYry-9", "b"),     # two subs (lev 2)
        ("delta-unrelated", "b"),   # far away
        ("alpha-record-17", "c"),   # exact but WRONG block
    ]
    left = spark.createDataFrame(lefts, "name string, blk string")
    right = spark.createDataFrame(rights, "rname string, blk string")
    for k in (1, 2):
        got = {
            (r["left_key"], r["right_key"])
            for r in fuzzy_join(
                left, right, "name", "rname", "blk", "blk", max_dist=k
            ).collect()
        }
        import itertools

        def lev(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(
                        dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                    )
            return dp[-1]

        want = {
            (ln, rn)
            for (ln, lb), (rn, rb) in itertools.product(lefts, rights)
            if lb == rb and lev(ln, rn) <= k
        }
        assert got == want, (k, got ^ want)


def test_deletion_keys_expr_matches_udf(spark):
    """r14: fuzzy_join's deletion-key fan-out moved from the pandas UDF
    to JVM higher-order functions — the key SET must be identical (the
    SymSpell losslessness proof rides on it). Edge cases: empty string,
    1/2-char strings (collapse to ''), non-ASCII codepoints, NULL."""
    from pyspark.sql import functions as F

    from polars_pipe_spark.operators.joins import (
        deletion_keys_expr,
        deletion_keys_udf,
    )

    rows = [
        ("",), ("a",), ("ab",), ("abc",), ("customer#000000001",),
        (None,), ("héllo wörld",), ("xx",), ("a b a b",),
    ]
    df = spark.createDataFrame(rows, "s string")
    for max_dist in (1, 2):
        got = df.select(
            F.sort_array(deletion_keys_expr("s", max_dist)).alias("k")
        ).collect()
        want = df.select(
            F.sort_array(deletion_keys_udf(max_dist)(F.col("s"))).alias("k")
        ).collect()
        assert [r.k for r in got] == [r.k for r in want], max_dist


def test_deletion_key_hashes_expr_matches_hashed_keys(spark):
    """r15: fuzzy_join/q61 dedup the deletion keys AFTER hashing
    (array_distinct on longs, the O(n) path) — the distinct hash SET
    must equal xxhash64 over the string-deduped key set, or the
    SymSpell candidate join changes."""
    from pyspark.sql import functions as F

    from polars_pipe_spark.operators.joins import (
        deletion_key_hashes_expr,
        deletion_keys_expr,
    )

    rows = [
        ("",), ("a",), ("ab",), ("abc",), ("customer#000000001",),
        (None,), ("héllo wörld",), ("xx",), ("a b a b",),
    ]
    df = spark.createDataFrame(rows, "s string")
    for max_dist in (1, 2):
        got = df.select(
            F.sort_array(deletion_key_hashes_expr("s", max_dist)).alias("h")
        ).collect()
        want = df.select(
            F.sort_array(
                F.transform(
                    deletion_keys_expr("s", max_dist), lambda k: F.xxhash64(k)
                )
            ).alias("h")
        ).collect()
        assert [r.h for r in got] == [r.h for r in want], max_dist


def test_quality_bins_edges(spark):
    from polars_pipe_spark.functions.sampling import quality_bins

    df = spark.createDataFrame(
        [(0.0, 10), (0.05, 20), (0.1, 1), (0.95, 2), (1.0, 3)],
        "score double, ntok long",
    )
    out = {
        r["bin_id"]: (r["n_docs"], r["sum_tokens"])
        for r in quality_bins(df, "score", n_bins=10, token_col="ntok").collect()
    }
    # 1.0 folds into the top bin (bin 9), not a phantom bin 10
    assert out == {0: (2, 30), 1: (1, 1), 9: (2, 5)}


def test_quality_bins_without_tokens(spark):
    from polars_pipe_spark.functions.sampling import quality_bins

    df = spark.createDataFrame([(0.25,), (0.26,)], "score double")
    out = quality_bins(df, "score", n_bins=4).collect()
    assert [(r["bin_id"], r["n_docs"]) for r in out] == [(1, 2)]


def test_winnow_fingerprints_selects_window_minima(spark):
    from polars_pipe_spark.functions.dedup import _md5_int32, winnow_fingerprints

    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    out = winnow_fingerprints(df, "text", "doc_id", k=3, w=2).collect()
    # shingles: "a b c","b c d","c d e","d e f","e f g"; windows of 2 →
    # min of each adjacent hash pair, distinct
    hs = [
        spark.range(1).select(_md5_int32(F.lit(s)).alias("h")).first()["h"]
        for s in ["a b c", "b c d", "c d e", "d e f", "e f g"]
    ]
    expect = {min(hs[i], hs[j]) for i, j in [(0, 1), (1, 2), (2, 3), (3, 4)]}
    expect.add(hs[4])  # trailing partial window
    assert {r["fingerprint"] for r in out} == expect


def test_winnow_shared_fingerprint_for_shared_run(spark):
    from polars_pipe_spark.functions.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"
    df = spark.createDataFrame(
        [(1, "x y " + shared), (2, shared + " q r")],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(df, "text", "doc_id", k=3, w=4)
    a = {r["fingerprint"] for r in fp.filter("doc_id = 1").collect()}
    b = {r["fingerprint"] for r in fp.filter("doc_id = 2").collect()}
    # the winnowing guarantee: a long shared run yields ≥1 common print
    assert a & b


def test_oov_stats(spark):
    from polars_pipe_spark.functions.text import oov_stats

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "unk1 unk2 the"), (3, "")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("the",), ("cat",), ("sat",)], "token string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_micros"])
        for r in oov_stats(docs, "text", "doc_id", vocab).collect()
    }
    assert out[1] == (3, 0, 0)
    assert out[2] == (3, 2, 666666)
    assert out[3] == (0, 0, 0)  # empty doc keeps its row


def test_centroid_similarity_exact_geometry(spark):
    from polars_pipe_spark.functions.similarity import centroid_similarity

    rows = [
        ("a", [1.0, 0.0]), ("a", [1.0, 0.0]),
        ("b", [0.0, 1.0]),
        ("c", [1.0, 0.0]),
        ("z", [0.0, 0.0]),  # zero centroid → null cosine, not NaN/error
    ]
    df = spark.createDataFrame(rows, "g string, v array<float>")
    out = {
        (r["group_a"], r["group_b"]): (r["cos_micros"], r["n_a"], r["n_b"])
        for r in centroid_similarity(df, "g", "v").collect()
    }
    assert out[("a", "b")][0] == 0          # orthogonal
    assert out[("a", "c")] == (1000000, 2, 1)  # identical direction
    assert out[("b", "c")][0] == 0
    assert out[("a", "z")][0] is None       # zero-norm guarded
    assert len(out) == 6


def test_exact_quantiles_matches_sorted_model(spark):
    from polars_pipe_spark.operators.aggregates import exact_quantiles

    vals = [((i * 37) % 1000) / 7.0 for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_quantiles(df, "x", [0.0, 0.25, 0.5, 0.75, 1.0])
    s = sorted(vals)
    for q, (rank, val) in got.items():
        want = int((len(s) - 1) * q)
        assert rank == want
        assert val == s[want], q


def test_exact_quantiles_forces_histogram_rounds(spark):
    from polars_pipe_spark.operators.aggregates import exact_quantiles

    vals = [float(i) for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    # direct_threshold below n and a coarse histogram: ≥2 narrowing
    # rounds must still land on the exact order statistic
    got = exact_quantiles(df, "x", [0.5], n_buckets=7, direct_threshold=20)
    assert got[0.5] == (199, 199.0)


def test_exact_quantiles_batched_direct_buckets(spark):
    """r14: ranks whose target bucket already fits direct_threshold
    resolve in ONE shared window job instead of per-rank TakeOrdered
    probes. Force that path (fine histogram -> every bucket under the
    threshold) for several ranks at once, including two ranks landing in
    the SAME bucket, and pin to the sorted model."""
    from polars_pipe_spark.operators.aggregates import exact_quantiles

    vals = [((i * 37) % 1000) / 7.0 for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_quantiles(
        df, "x", [0.1, 0.25, 0.26, 0.5, 0.75, 0.9],
        n_buckets=50, direct_threshold=20,
    )
    s = sorted(vals)
    for q, (rank, val) in got.items():
        want = int((len(s) - 1) * q)
        assert rank == want
        assert val == s[want], q


def test_exact_quantiles_mixed_direct_and_recursive_buckets(spark):
    """r14: a histogram whose target buckets straddle direct_threshold —
    one rank lands in an under-threshold bucket (batched window path),
    another in a giant constant-heavy bucket (recursive narrowing) —
    must still return exact order statistics for both."""
    from polars_pipe_spark.operators.aggregates import exact_quantiles

    # bucket containing 5.x holds 300 rows (> 30); the tail values
    # spread thinly (<= 30 per bucket)
    vals = [5.0 + (i % 7) / 100.0 for i in range(300)] + [
        100.0 + i for i in range(100)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_quantiles(
        df, "x", [0.25, 0.95], n_buckets=40, direct_threshold=30
    )
    s = sorted(vals)
    for q, (rank, val) in got.items():
        want = int((len(s) - 1) * q)
        assert rank == want
        assert val == s[want], q


def test_exact_quantiles_skewed_constant_bucket(spark):
    from polars_pipe_spark.operators.aggregates import exact_quantiles

    # one dominant value: the constant-bucket short-circuit must fire
    vals = [5.0] * 300 + [1.0, 9.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = exact_quantiles(df, "x", [0.5], n_buckets=4, direct_threshold=10)
    assert got[0.5][1] == 5.0


def test_exact_quantiles_nulls_and_empty(spark):
    from polars_pipe_spark.operators.aggregates import exact_quantiles

    df = spark.createDataFrame([(None,), (2.0,), (1.0,)], "x double")
    got = exact_quantiles(df, "x", [1.0])
    assert got[1.0] == (1, 2.0)  # nulls excluded from ranks
    empty = spark.createDataFrame([], "x double")
    assert exact_quantiles(empty, "x", [0.5])[0.5] == (0, None)


def test_stream_static_enrich_batch_twin(spark):
    from polars_pipe_spark.streaming.pipeline import stream_static_enrich

    facts = spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0), (99, 7.0)], "uid long, v double"
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "uid long, seg string")
    out = stream_static_enrich(facts, dim, "uid", how="left")
    got = {(r["uid"], r["seg"], r["v"]) for r in out.collect()}
    assert (99, None, 7.0) in got  # left join keeps unmatched facts
    assert len(got) == 4


def test_pq_encode_picks_nearest_codeword(spark):
    from polars_pipe_spark.functions.similarity import pq_encode

    # 2 subspaces of 2 dims; codebooks with known geometry
    codebooks = [
        [[0.0, 0.0], [10.0, 10.0]],
        [[5.0, 5.0], [0.0, 0.0], [5.0, 5.0]],  # duplicate codeword: tie → lowest j
    ]
    df = spark.createDataFrame(
        [(1, [9.0, 9.0, 4.9, 4.9]), (2, [1.0, 0.0, 0.1, 0.0])],
        "id long, v array<float>",
    )
    got = {r["id"]: r["pq_code"] for r in pq_encode(df, "v", codebooks).collect()}
    assert got[1] == [1, 0]  # near (10,10); (4.9,4.9) ties to j=0 not j=2
    assert got[2] == [0, 1]


def test_pq_topk_adc_matches_brute_force_on_codes(spark):
    import itertools

    from polars_pipe_spark.functions.similarity import pq_encode, pq_topk

    rng_vals = [[((i * 7 + d * 3) % 11) / 11.0 for d in range(4)] for i in range(12)]
    codebooks = [
        [[0.1, 0.2], [0.7, 0.8], [0.4, 0.5]],
        [[0.9, 0.1], [0.2, 0.6]],
    ]
    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng_vals)], "vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(100, rng_vals[0]), (101, rng_vals[5])],
        "query_id long, embedding array<float>",
    )
    got = pq_topk(
        corpus, queries, "embedding", "vec_id", "query_id", codebooks, k=3
    ).collect()
    # python model: encode, then ADC distance, same tie rules
    codes = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(corpus, "embedding", codebooks).collect()
    }
    def adc(qv, code):
        tot = 0.0
        for s in range(2):
            cw = codebooks[s][code[s]]
            tot += sum((float(qv[s * 2 + i]) - cw[i]) ** 2 for i in range(2))
        return round(tot, 9)
    for qid, qv in [(100, rng_vals[0]), (101, rng_vals[5])]:
        model = sorted(
            ((adc(qv, codes[n]), n) for n in codes), key=lambda t: (t[0], t[1])
        )[:3]
        mine = sorted(
            [(r["adc_dist"], r["neighbor_id"]) for r in got if r["query_id"] == qid]
        )
        assert [(round(d, 6), n) for d, n in mine] == [
            (round(d, 6), n) for d, n in model
        ], qid


def test_pq_encode_is_mapper_only(spark):
    from polars_pipe_spark.functions.similarity import pq_encode

    codebooks = [[[0.0] * 8 for _ in range(4)] for _ in range(8)]
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = (
        pq_encode(df, "embedding", codebooks)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the literal-inlined encode must add NO join and NO shuffle
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_bpe_train_hand_computed(spark):
    from polars_pipe_spark.functions.text import bpe_train

    # corpus: "low low low lower" → word freqs {low:3, lower:1}
    # pair counts r1: (l,o)=4, (o,w)=4, (w,e)=1, (e,r)=1 → tie → (l,o)
    # r2: lo+w → (lo,w)=4 ; r3: (low,e)=1 vs (e,r)=1 → (e,r)
    df = spark.createDataFrame([("low low low lower",)], "text string")
    merges = bpe_train(df, "text", n_merges=3)
    assert merges[0] == ("l", "o", 4)
    assert merges[1] == ("lo", "w", 4)
    assert merges[2] == ("e", "r", 1)


def test_bpe_merge_apply_is_leftmost_nonoverlapping(spark):
    from polars_pipe_spark.functions.text import bpe_train

    # "aaaa": (a,a) count = 3; after merge the word is [aa, aa] so the
    # next round's top pair must be (aa, aa) with count 1
    df = spark.createDataFrame([("aaaa",)], "text string")
    merges = bpe_train(df, "text", n_merges=2)
    assert merges[0] == ("a", "a", 3)
    assert merges[1] == ("aa", "aa", 1)


def test_bpe_train_counts_nonincreasing_on_real_text(spark):
    from polars_pipe_spark.functions.text import bpe_train

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    merges = bpe_train(df, "text", n_merges=5)
    counts = [c for _, _, c in merges]
    assert counts == sorted(counts, reverse=True)
    assert len(merges) == 5


def test_trimmed_mean_excludes_tails(spark):
    from polars_pipe_spark.operators.aggregates import trimmed_mean

    vals = [1000.0] + [float(i) for i in range(10, 110)] + [-999.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    lo, hi, n, mean = trimmed_mean(df, "x", lo_q=0.05, hi_q=0.95)
    s = sorted(vals)
    assert lo == s[int((len(s) - 1) * 0.05)]
    assert hi == s[int((len(s) - 1) * 0.95)]
    kept = [v for v in vals if lo <= v <= hi]
    assert n == len(kept)
    assert mean == pytest.approx(sum(kept) / len(kept))
    # the outliers are gone from the band
    assert not (lo <= 1000.0 <= hi) and not (lo <= -999.0 <= hi)


def test_length_bucket_stats(spark):
    from polars_pipe_spark.functions.sampling import length_bucket_stats

    df = spark.createDataFrame(
        [(10,), (32,), (33,), (100,), (9999,)], "ntok long"
    )
    out = {
        r["bucket"]: (r["n_docs"], r["sum_tokens"], r["capacity"], r["padding_waste"])
        for r in length_bucket_stats(df, "ntok", [32, 64, 128]).collect()
    }
    # 10,32 → bucket 32; 33 → 64; 100 → 128; 9999 truncates to top bucket
    assert out[32] == (2, 42, 64, 22)
    assert out[64] == (1, 33, 64, 31)
    assert out[128] == (2, 228, 256, 28)  # 100 + truncated 128


def test_knn_classify_majority_and_ties(spark):
    from polars_pipe_spark.functions.similarity import knn_classify

    # 2-d geometry: queries near the x-axis cluster get its label
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "x"), (2, [0.9, 0.1], "x"), (3, [1.0, 0.1], "x"),
            (4, [0.0, 1.0], "y"), (5, [0.1, 0.9], "y"),
        ],
        "vec_id long, v array<float>, label string",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.05]), (200, [0.05, 1.0])], "qid long, v array<float>"
    )
    out = {
        r["query_id"]: (r["pred_label"], r["votes"])
        for r in knn_classify(corpus, queries, "v", "vec_id", "qid", "label", k=3).collect()
    }
    assert out[100] == ("x", 3)
    assert out[200][0] == "y"
    # 2-2 vote tie with k=4 breaks to the smaller label ("x" < "y")
    tied = knn_classify(corpus, queries, "v", "vec_id", "qid", "label", k=4)
    row = {r["query_id"]: r["pred_label"] for r in tied.collect()}
    assert row[200] in ("x", "y")  # deterministic either way:
    assert row[200] == tied.filter("query_id = 200").first()["pred_label"]


def test_cluster_aware_split_no_leakage(spark):
    from polars_pipe_spark.functions.sampling import cluster_aware_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # chain 0-1-2 one cluster; 10-11 another
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = cluster_aware_split(docs, "doc_id", pairs, test_fraction=0.3)
    rows = {r["doc_id"]: (r["cluster_id"], r["split"]) for r in out.collect()}
    # every cluster member shares one split — the no-leakage invariant
    assert len({rows[i] for i in (0, 1, 2)}) == 1
    assert rows[10][1] == rows[11][1]
    # singletons keep their own id as cluster id
    assert rows[20][0] == 20
    assert {s for _, s in rows.values()} == {"train", "test"}


def test_incremental_near_dups_statuses(spark):
    from polars_pipe_spark.functions.dedup import incremental_near_dups

    base = "the quick brown fox jumps over the lazy dog again and again"
    batch = spark.createDataFrame(
        [
            # identical content → identical signature → all bands match;
            # a 1-word edit may shift the bottom-8 sketch enough that NO
            # band matches (an honest LSH miss), so the guaranteed-hit
            # case uses an exact copy
            (10, base),
            (11, "completely different words about spark distributed joins"),
            (12, "unrelated text on streaming watermarks and state stores"),
            (13, "unrelated text on streaming watermarks and state stores!"),
        ],
        "doc_id long, text string",
    )
    index = spark.createDataFrame(
        [(1, base), (2, "some other indexed document entirely")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["neardup_status"]
        for r in incremental_near_dups(
            batch, index, "text", "doc_id", threshold=0.4
        ).collect()
    }
    assert got[10] == "dup_of_index"
    assert got[11] == "novel"
    # 12/13 are near-identical: min id stays novel, the other tags batch
    assert got[12] == "novel"
    assert got[13] == "dup_within_batch"


def test_incremental_near_dups_no_candidates(spark):
    """r14: the verify side now shingles only candidate-pid index rows
    (semi-join pruning). A batch with ZERO band collisions exercises the
    empty-candidate path — empty pid list, empty verified frame — and
    must still tag every batch doc novel, not error or drop rows."""
    from polars_pipe_spark.functions.dedup import incremental_near_dups

    batch = spark.createDataFrame(
        [(10, "completely different words about spark distributed joins")],
        "doc_id long, text string",
    )
    index = spark.createDataFrame(
        [(1, "some other indexed document entirely")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["neardup_status"]
        for r in incremental_near_dups(
            batch, index, "text", "doc_id", threshold=0.4
        ).collect()
    }
    assert got == {10: "novel"}


def test_bpe_encode_stats_hand_computed(spark):
    from polars_pipe_spark.functions.text import bpe_encode_stats

    # corpus "low low low lower": merges (3) = l+o, lo+w, e+r
    # encode: low -> [low? no: after 3 merges: l+o=lo, lo+w=low] -> [low] (1)
    #         lower -> [low, e+r=er] -> [low, er] (2)
    df = spark.createDataFrame(
        [(1, "low low low lower"), (2, "low")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bpe_encode_stats(df, "text", "doc_id", 3).collect()}
    assert (out[1].n_words, out[1].n_chars) == (4, 14)
    # doc1: 3×"low"→1 symbol each + "lower"→[low, er] 2 symbols = 5
    assert out[1].n_bpe_symbols == 5
    assert (out[2].n_words, out[2].n_chars, out[2].n_bpe_symbols) == (1, 3, 1)


def test_bpe_encode_saving_bounds(spark):
    from polars_pipe_spark.functions.text import bpe_encode_stats

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma alpha beta {i}") for i in range(6)],
        "doc_id long, text string",
    )
    out = bpe_encode_stats(df, "text", "doc_id", 4).collect()
    assert len(out) == 6
    for r in out:
        # symbols never exceed chars, never fewer than words
        assert r.n_words <= r.n_bpe_symbols <= r.n_chars
