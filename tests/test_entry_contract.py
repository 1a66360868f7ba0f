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


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_and_is_stable(spark, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF)
    cols = df.columns
    n = df.count()
    assert n >= 0 and len(cols) > 0
    # schema stable across two invocations
    assert fn(spark, SF).columns == cols
