"""Driver-contract smoke: every queries() entry runs at sf0.001 with a
stable schema; oracle keys ⊆ query keys; entry() returns rows."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_oracle_keys_subset_of_queries():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q
    # r5: EVERY registered query carries an oracle. q12 (xxhash64) and
    # q149 (LAPACK eigh) — the last two rows-only holdouts — graduated
    # to oracle-checked projections: q12 checks the lineage literals +
    # hash totality (value determinism/collisions via q167), q149 checks
    # the whitened-covariance identity over the full corpus.
    assert q - o == set()


def test_registry_matches_committed_correctness_artifact():
    """r6 VERDICT task 1 close-out: the LATEST committed
    CORRECTNESS_LOCAL_r*.json must cover EXACTLY the registered queries,
    and every row must be green.  This is the test that fails when a new
    query is registered without regenerating the artifact (the q275 gap
    that persisted across rounds 5–7)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = glob.glob(os.path.join(root, "CORRECTNESS_LOCAL_r*.json"))
    assert arts, "no CORRECTNESS_LOCAL artifact committed"
    latest = max(arts, key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)))
    with open(latest) as f:
        rows = json.load(f)
    registry = set(entry_mod.queries())
    assert set(rows) == registry, (
        f"{os.path.basename(latest)} covers {len(rows)} queries but the "
        f"registry has {len(registry)}; regenerate with "
        f"`python tools/check_oracle.py --json {os.path.basename(latest)}` "
        f"(missing: {sorted(registry - set(rows))[:5]}, "
        f"stale: {sorted(set(rows) - registry)[:5]})"
    )
    red = {
        k: v
        for k, v in rows.items()
        if v.get("err") is not None
        or not (v.get("rows_match") and v.get("hash_match", True))
    }
    assert not red, f"non-green rows in {os.path.basename(latest)}: {sorted(red)[:10]}"


def test_registry_matches_committed_sf01_artifact():
    """r11 (r10 verdict task 1): the oracle comparison must also hold at
    sf0.1 — the q230 long-overflow proved wrong-answer-AT-SCALE is a
    real defect class that the sf0.01-only artifact cannot see. The
    latest committed CORRECTNESS_SF01_r*.json must cover EXACTLY the
    registered queries and every row must be green, same contract as
    the sf0.01 artifact above. Regenerate with
    `SF_DIR=/root/testdata/sf0.1 python tools/check_oracle.py --json
    CORRECTNESS_SF01_r<N>.json`."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = glob.glob(os.path.join(root, "CORRECTNESS_SF01_r*.json"))
    assert arts, "no CORRECTNESS_SF01 artifact committed (r11 contract)"
    latest = max(arts, key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)))
    with open(latest) as f:
        rows = json.load(f)
    registry = set(entry_mod.queries())
    assert set(rows) == registry, (
        f"{os.path.basename(latest)} covers {len(rows)} queries but the "
        f"registry has {len(registry)} "
        f"(missing: {sorted(registry - set(rows))[:5]}, "
        f"stale: {sorted(set(rows) - registry)[:5]})"
    )
    red = {
        k: v
        for k, v in rows.items()
        if v.get("err") is not None
        or not (v.get("rows_match") and v.get("hash_match", True))
    }
    assert not red, f"non-green rows in {os.path.basename(latest)}: {sorted(red)[:10]}"


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_and_is_stable(spark, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF)
    cols = df.columns
    n = df.count()
    assert n >= 0 and len(cols) > 0
    # schema stable across two invocations
    assert fn(spark, SF).columns == cols
