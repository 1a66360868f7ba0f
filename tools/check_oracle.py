#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs each ``__spark_entry__.queries()`` entry at sf0.01 and compares with
the matching ``oracle_sql()`` in DuckDB: row count, sorted column names,
and an order-insensitive value hash (rows canonicalised: columns sorted by
name, floats at full round-trip precision, rows sorted; then sha256).

Usage: python tools/check_oracle.py [query ...]    # default: all
       SF_DIR=/root/testdata/sf0.001 python tools/check_oracle.py
       python tools/check_oracle.py --json CORRECTNESS_LOCAL_r3.json

``--json PATH`` additionally writes a per-query artifact in the same
shape as the driver's CORRECTNESS_r*.json, so the local replica's
verdict on driver-unchecked queries is recorded and diffable per round.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_value(v):
    if v is None:
        return "\x00"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # Full round-trip precision (stricter than the driver): round-1's
        # 9-sig-fig canonicalisation masked a 6th-decimal HALF_UP/HALF_EVEN
        # divergence the driver caught. Strict local ⇒ local green predicts
        # driver green.
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted("|".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return sorted_cols, h


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as entry_mod
    from polars_pipe_spark import get_spark

    spark = get_spark(app_name="oracle_check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    wanted = args or list(queries)

    report: dict[str, dict] = {}

    def record(name, *, rows=None, orows=None, err=None, rm=None, sm=None, hm=None):
        report[name] = {
            "rows_match": rm, "schema_match": sm, "hash_match": hm,
            "spark_rows": rows, "oracle_rows": orows, "err": err,
        }

    n_pass = n_fail = n_weak = 0
    for name in wanted:
        if name not in queries:
            print(f"{name}: NOT IN queries()")
            record(name, err="not_in_queries")
            n_fail += 1
            continue
        # queries that persist() intermediates must not leak caches into
        # the rest of the sweep (79 queries share this one session)
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"{name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
            record(name, err=f"spark:{type(e).__name__}")
            n_fail += 1
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows={len(s_rows)} (rows-only check, no oracle) [{spark_s:.1f}s]")
            record(name, rows=len(s_rows), err="no_oracle")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"{name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:200]}")
            record(name, rows=len(s_rows), err=f"duckdb:{type(e).__name__}")
            n_fail += 1
            continue

        sc, sh = canon_rows(s_cols, s_rows)
        dc, dh = canon_rows(d_cols, d_rows)
        record(
            name, rows=len(s_rows), orows=len(d_rows),
            rm=len(s_rows) == len(d_rows), sm=sc == dc, hm=sh == dh,
        )
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sc != dc:
            problems.append(f"cols spark={sc} duck={dc}")
        if sh != dh:
            problems.append(f"hash spark={sh} duck={dh}")
        if problems:
            print(f"{name}: MISMATCH {'; '.join(problems)} [{spark_s:.1f}s]")
            if sc == dc and len(s_rows) == len(d_rows):
                # show first differing canonical row to debug
                order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                sl = sorted("|".join(canon_value(r[i]) for i in order) for r in s_rows)
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                dl = sorted("|".join(canon_value(r[i]) for i in order_d) for r in d_rows)
                for a, b in zip(sl, dl):
                    if a != b:
                        print(f"   spark: {a[:220]}\n   duck : {b[:220]}")
                        break
            n_fail += 1
        else:
            print(f"{name}: OK rows={len(s_rows)} hash={sh} [{spark_s:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_weak} rows-only, {n_fail} failed / {len(wanted)} total")
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path} ({len(report)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
