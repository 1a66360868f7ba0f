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
    # the rows-only set is intentional and small: q12 = xxhash64 has no
    # DuckDB twin; q149 = LAPACK eigendecomposition.  q33/q40 graduated to
    # oracle-checked property queries in r4 (exact counts + bounded
    # booleans the oracle asserts as literal TRUE).
    assert q - o == {"q12_lineage_hash", "q149_pca_whiten"}


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_and_is_stable(spark, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF)
    cols = df.columns
    n = df.count()
    assert n >= 0 and len(cols) > 0
    # schema stable across two invocations
    assert fn(spark, SF).columns == cols
