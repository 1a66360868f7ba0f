"""Driver-contract smoke: every queries() entry runs at sf0.001 with a
stable schema; oracle keys ⊆ query keys; entry() returns rows."""

from __future__ import annotations

from pathlib import Path

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


@pytest.fixture(scope="session")
def ladder_sf(tmp_path_factory):
    """Extended-schema sf0.001 fixture for the full-fidelity TPC-H
    ladder plans (r13 verdict task 6: an API change that breaks only a
    ladder plan must fail HERE, not at the next oracle run). Generated,
    not read from /root/testdata — the driver fixtures lack partsupp /
    commit-receipt dates / c_phone / p_container by design."""
    import sys

    out = tmp_path_factory.mktemp("ladder_sf0.001")
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from gen_testdata import generate

    generate(0.001, str(out))
    return str(out)


@pytest.mark.parametrize("name", sorted(entry_mod.ladder_queries()))
def test_ladder_query_runs_and_is_stable(spark, ladder_sf, name):
    fn = entry_mod.ladder_queries()[name]
    df = fn(spark, ladder_sf)
    cols = df.columns
    n = df.count()
    assert n >= 0 and len(cols) > 0
    assert fn(spark, ladder_sf).columns == cols


# the cap-sensitive family (r11 verdict task 4): queries whose Spark
# side carries a cap/fence that could first BIND above sf0.1 — the
# minhash band-cap family (DROP class, oracle replays the cap), the
# uncapped-by-design incremental gate, the simhash banded pair set, the
# fuzzy-join guard family (RAISE class), and the budgeted ANN paths
# (FALLBACK class). See COVERAGE.md "Cap-contract table".
CAP_SENSITIVE_FAMILY = {
    "q25_minhash_neardup", "q63_dedup_clusters", "q73_dedup_apply",
    "q144_quality_rep_dedup", "q175_cluster_split", "q201_lsh_precision",
    "q234_dedup_survivorship", "q241_dup_graph_triangles", "q252_pagerank",
    "q183_incremental_neardup", "q251_simhash_banded", "q26_simhash",
    "q61_fuzzy_join", "q160_fuzzy_join", "q256_entity_resolution",
    "q28_cosine_topk", "q168_pq_topk", "q236_semantic_dedup",
}


def test_cap_sensitive_family_green_at_sf1():
    """r12 (r11 verdict task 4): the cap-sensitive family must be
    oracle-green at sf1 — the rung where a cap that is slack at sf0.1
    could first saturate (the q251 failure class one rung later). The
    committed CORRECTNESS_SF1_r*.json must cover the family and be all
    green. Regenerate with `SF_DIR=/tmp/pps_scale/sf1 python
    tools/check_oracle.py --json CORRECTNESS_SF1_r<N>.json <family>`
    (fixtures via `python tools/gen_testdata.py --sf 1 --out
    /tmp/pps_scale/sf1`)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = glob.glob(os.path.join(root, "CORRECTNESS_SF1_r*.json"))
    assert arts, "no CORRECTNESS_SF1 artifact committed (r12 contract)"
    latest = max(arts, key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)))
    with open(latest) as f:
        rows = json.load(f)
    missing = CAP_SENSITIVE_FAMILY - set(rows)
    assert not missing, f"{os.path.basename(latest)} missing family rows: {sorted(missing)}"
    red = {
        k: v
        for k, v in rows.items()
        if v.get("err") is not None
        or not (v.get("rows_match") and v.get("hash_match", True))
    }
    assert not red, f"non-green rows in {os.path.basename(latest)}: {sorted(red)[:10]}"


# the DROP-class subset whose caps/pair mass the plain sf1 fixture
# cannot exercise (gen_testdata's corpus has ~no near-dups at sf1, so
# their sf1 rows are 0-row matches — vacuously green, r12 review
# finding 4)
DUP_MASS_FAMILY = {
    "q25_minhash_neardup", "q63_dedup_clusters", "q73_dedup_apply",
    "q144_quality_rep_dedup", "q175_cluster_split", "q201_lsh_precision",
    "q234_dedup_survivorship", "q241_dup_graph_triangles", "q252_pagerank",
    "q183_incremental_neardup", "q251_simhash_banded", "q26_simhash",
    "q285_band_cap_report",
}

# members whose outputs must be NON-EMPTY on the dup-mass fixture for
# the rung to mean anything (q201/q234/q241/q252/q285 are aggregates —
# 1-row outputs are already meaningful)
DUP_MASS_NONZERO = {
    "q25_minhash_neardup", "q63_dedup_clusters", "q73_dedup_apply",
    "q183_incremental_neardup", "q251_simhash_banded", "q26_simhash",
}


def test_dup_mass_family_green_and_nonvacuous():
    """r12 (review finding 4): the plain sf1 rung is VACUOUS for the
    minhash pair family (0-row matches), and the band cap can never
    bind on a corpus with no colliding buckets. The dup-mass fixture
    (tools/gen_dupmass.py: sf1 base + a 1500-copy identical cluster
    that SATURATES every band bucket past the production cap of 1000 +
    engineered near-dup clusters) makes the cap BIND at rung scale; the
    committed CORRECTNESS_SF1DUP_r*.json must be all green AND the
    designated members must have produced rows. Regenerate with
    `python tools/gen_dupmass.py /tmp/pps_scale/sf1 /tmp/pps_scale/sf1dup`
    then `SF_DIR=/tmp/pps_scale/sf1dup python tools/check_oracle.py
    --json CORRECTNESS_SF1DUP_r<N>.json <family>`."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = glob.glob(os.path.join(root, "CORRECTNESS_SF1DUP_r*.json"))
    assert arts, "no CORRECTNESS_SF1DUP artifact committed (r12 contract)"
    latest = max(arts, key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)))
    with open(latest) as f:
        rows = json.load(f)
    missing = DUP_MASS_FAMILY - set(rows)
    assert not missing, f"{os.path.basename(latest)} missing rows: {sorted(missing)}"
    red = {
        k: v
        for k, v in rows.items()
        if v.get("err") is not None
        or not (v.get("rows_match") and v.get("hash_match", True))
    }
    assert not red, f"non-green rows in {os.path.basename(latest)}: {sorted(red)[:10]}"
    vacuous = {
        k for k in DUP_MASS_NONZERO if not rows[k].get("spark_rows")
    }
    assert not vacuous, (
        f"dup-mass rung is vacuous for {sorted(vacuous)} — the fixture "
        "no longer produces pair mass; regenerate with gen_dupmass.py"
    )
