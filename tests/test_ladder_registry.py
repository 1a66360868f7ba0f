"""Pin the full-fidelity TPC-H ladder registry (r12 verdict task 6).

The main registry's q119-q124 run on documented stand-ins because the
driver fixtures lack partsupp / commit-receipt dates / c_phone /
p_container. `__spark_entry__.ladder_queries()` carries the REAL forms,
oracle-checked on r13+ generator fixtures only; the committed
CORRECTNESS_LADDER_r*.json records that every one hash-matched DuckDB
on a full-schema fixture, non-vacuously.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

EXPECTED = {
    "l081_tpch_q4_full",
    "l082_tpch_q12_full",
    "l100_tpch_q17_full",
    "l119_tpch_q2_full",
    "l120_tpch_q9_full",
    "l121_tpch_q11_full",
    "l122_tpch_q20_full",
    "l123_tpch_q21_full",
    "l124_tpch_q22_full",
}


def test_registry_and_oracles_paired():
    import __spark_entry__ as entry

    q = entry.ladder_queries()
    o = entry.ladder_oracle_sql()
    assert set(q) == EXPECTED
    assert set(o) == EXPECTED
    # ladder keys must never leak into the driver-facing registry —
    # the driver would run them against fixtures missing the schema
    assert not (set(entry.queries()) & EXPECTED)


def test_committed_ladder_artifact_green_and_nonvacuous():
    arts = sorted(REPO.glob("CORRECTNESS_LADDER_r*.json"))
    assert arts, (
        "no CORRECTNESS_LADDER_r*.json — run SF_DIR=<full-schema fixture> "
        "python tools/check_oracle.py --registry ladder --json <artifact>"
    )
    with open(arts[-1]) as f:
        report = json.load(f)
    assert set(report) == EXPECTED
    for name, entry in report.items():
        assert entry["hash_match"] is True, (name, entry)
        assert entry["rows_match"] is True, (name, entry)
        # every shape must exercise real rows — a zero-row anti-join or
        # filter result would make the fidelity claim vacuous (the l124
        # lesson: the pre-r13 generator left ~0 customers orderless)
        assert entry["spark_rows"] >= 1, (name, entry)
