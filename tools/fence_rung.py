#!/usr/bin/env python
"""Fire every RAISE-class fence on REAL rung data and record the artifact.

r12 verdict task 3: the cap-contract table (COVERAGE.md) classifies the
RAISE-class paths — the fuzzy-join candidate-pair guard, the pq_topk
query fence, and the simhash full-collapse check — but until r13 each
had only unit-test (synthetic-frame) proof. This tool drives each fence
to its binding point on rung-scale fixtures through the PUBLIC
functions, plus a smaller-rung NEGATIVE CONTROL where the same call
passes, and writes a CORRECTNESS_FENCE artifact pinned by
tests/test_fence_rung.py.

The three rungs (all deterministic, all real fixture data):

1. **fuzzy-join pair guard** (`operators.joins.assert_blocked_join_budget`
   via `fuzzy_join`): the sf1dup appended slice (doc_id >= 1,000,000 —
   the r12 dup-mass corpus whose 1,500-copy IDENTICAL boilerplate
   cluster is exactly the duplicate-heavy degenerate the guard exists
   for) self-joined on text with length blocking: 1,500 identical
   ~200-char strings share every deletion signature, so the estimate is
   ~200 keys x 1,500^2 ≈ 450M pairs > the default 100M budget.
   Control: sf0.01 documents (500 unique docs) passes the same call.
2. **pq_topk query fence** (`functions.similarity.pq_topk`): the sf1
   embeddings table (50,000 vectors) passed AS the query batch exceeds
   ``max_queries=4096`` — the driver-side ADC LUT build must refuse, not
   OOM.  Control: sf0.1 embeddings (2,000 rows) fits the batch.
3. **simhash full-collapse check** (`functions.dedup.simhash_near_dups`):
   the same sf1dup boilerplate slice under the 16-bit/4-band test
   signature — 1,500 identical docs occupy exactly n_bands buckets,
   every one of them > max_band_members=1000, the one corpus shape
   where the collapse raise replaces a silent zero-pair result.
   Control: sf0.01 documents (500 docs, ~31/bucket) passes.

Usage:
    python tools/fence_rung.py [--json CORRECTNESS_FENCE_r13.json]

Exit 0 iff every fence FIRED with its named error AND every control
passed. Fixture paths default to the ladder layout under /tmp/pps_scale
(regenerate with tools/gen_testdata.py) and the driver testdata dirs.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF001 = os.environ.get("FENCE_SF001", "/root/testdata/sf0.01")
SF01 = os.environ.get("FENCE_SF01", "/root/testdata/sf0.1")
SF1 = os.environ.get("FENCE_SF1", "/tmp/pps_scale/sf1")
# the r12 dup-mass rung (tools/gen_dupmass.py): appended docs carry
# doc_id >= 1,000,000, led by a 1,500-copy identical boilerplate cluster
SF1DUP = os.environ.get("FENCE_SF1DUP", "/tmp/pps_scale/sf1dup")
DUPMASS_MIN_ID = 1_000_000
# the boilerplate cluster occupies [MIN_ID, MIN_ID+1500); the near-dup
# clusters after it would seed under-cap buckets and mask the collapse
DUPMASS_BOILER_END = 1_000_000 + 1500

REQUIRED_FENCES = ["fuzzy_pair_budget", "pq_query_fence", "simhash_collapse"]


def _read(spark, sf_dir: str, table: str):
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _fire(fn, needle: str) -> dict:
    """Run fn expecting ValueError containing `needle`."""
    try:
        fn()
    except ValueError as e:
        msg = str(e)
        return {
            "fired": needle in msg,
            "error": "ValueError",
            "message_head": msg[:220],
        }
    except Exception as e:  # noqa: BLE001 — wrong error class is a failure
        return {"fired": False, "error": type(e).__name__, "message_head": str(e)[:220]}
    return {"fired": False, "error": None, "message_head": "no error raised"}


def _control(fn) -> dict:
    """Run fn expecting NO raise (the fence must not fire below the rung)."""
    try:
        n = fn()
    except Exception as e:  # noqa: BLE001
        return {"passed": False, "error": f"{type(e).__name__}: {str(e)[:160]}"}
    return {"passed": True, "rows": n}


def run(spark) -> dict:
    from pyspark.sql import functions as F

    from polars_pipe_spark.functions.dedup import simhash_near_dups
    from polars_pipe_spark.functions.similarity import pq_topk
    from polars_pipe_spark.operators.joins import fuzzy_join

    results: dict[str, dict] = {}

    # --- 1. fuzzy-join candidate-pair budget --------------------------
    def _fuzzy(sf_dir: str, dupmass_only: bool):
        docs = _read(spark, sf_dir, "documents")
        if dupmass_only:
            docs = docs.filter(
                (F.col("doc_id") >= DUPMASS_MIN_ID)
                & (F.col("doc_id") < DUPMASS_BOILER_END)
            )
        frame = docs.select("doc_id", "text")
        out = fuzzy_join(
            frame,
            frame,
            "text",
            "text",
            F.length("text"),
            F.length("text"),
            max_dist=1,
        )
        return out.limit(1).count()

    results["fuzzy_pair_budget"] = {
        "rung": (
            f"{SF1DUP}/documents doc_id>={DUPMASS_MIN_ID} (1,500-copy "
            "identical cluster => shared deletion signatures)"
        ),
        **_fire(lambda: _fuzzy(SF1DUP, True), "candidate-pair budget exceeded"),
        "control": {
            "rung": f"{SF001}/documents (500 unique docs, same call)",
            **_control(lambda: _fuzzy(SF001, False)),
        },
    }

    # --- 2. pq_topk driver-side query fence ---------------------------
    def _pq(query_sf: str):
        emb = _read(spark, SF01, "embeddings")
        cb_rows = sorted(
            emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect(),
            key=lambda r: r["vec_id"],
        )
        codebooks = [
            [[float(x) for x in r["embedding"][s * 8 : (s + 1) * 8]] for r in cb_rows]
            for s in range(8)
        ]
        queries = _read(spark, query_sf, "embeddings").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = pq_topk(emb, queries, "embedding", "vec_id", "query_id", codebooks, k=3)
        return out.limit(1).count()

    results["pq_query_fence"] = {
        "rung": f"{SF1}/embeddings (50k rows) as the query batch",
        **_fire(lambda: _pq(SF1), "exceeds max_queries"),
        "control": {
            "rung": f"{SF01}/embeddings (2k rows) as the query batch",
            **_control(lambda: _pq(SF01)),
        },
    }

    # --- 3. simhash full-collapse check --------------------------------
    def _simhash(sf_dir: str, dupmass_only: bool):
        docs = _read(spark, sf_dir, "documents")
        if dupmass_only:
            docs = docs.filter(
                (F.col("doc_id") >= DUPMASS_MIN_ID)
                & (F.col("doc_id") < DUPMASS_BOILER_END)
            )
        out = simhash_near_dups(docs, "text", "doc_id")  # test-default 16/4
        return out.limit(1).count()

    results["simhash_collapse"] = {
        "rung": (
            f"{SF1DUP}/documents doc_id>={DUPMASS_MIN_ID} (identical "
            "cluster => every occupied band bucket > cap)"
        ),
        **_fire(lambda: _simhash(SF1DUP, True), "LSH band cap collapse"),
        "control": {
            "rung": f"{SF001}/documents (same signature, buckets ~31 deep)",
            **_control(lambda: _simhash(SF001, False)),
        },
    }

    ok = all(
        results[n]["fired"] and results[n]["control"]["passed"]
        for n in REQUIRED_FENCES
    )
    return {"ok": ok, "fences": results}


def main(argv: list[str]) -> int:
    out_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: fence_rung.py [--json PATH]", file=sys.stderr)
            return 2
        out_path = argv[i + 1]

    from polars_pipe_spark import get_spark

    spark = get_spark(app_name="fence_rung")
    report = run(spark)
    text = json.dumps(report, indent=1)
    print(text)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
