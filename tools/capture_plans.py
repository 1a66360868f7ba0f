"""Capture ``explain('formatted')`` for declared queries into plans/<tag>/.

Optimization-round deliverable (r14+): the judge cannot run Spark, so every
plan claim in OPTIMIZATION_r*.md must be backed by a committed
``plans/<tag>/<query>_<suffix>.txt`` produced by this tool.

Usage:
    python tools/capture_plans.py <tag> <suffix> [query ...]

e.g. ``python tools/capture_plans.py r14 before q63_dedup_clusters`` writes
``plans/r14/q63_dedup_clusters_before.txt``.  With no query names, captures
the full bench HEADLINE list.  SPARK_GRAFT_SF_DIR picks the fixture
(default /root/testdata/sf0.1 — same as the bench, so plan shapes match
what the bench times).

Only the PLAN is captured (``_sc._jvm`` explain string); queries whose
*construction* performs bounded actions (e.g. q236's 4-row centroid
collect) pay those, but nothing is executed beyond construction.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit("usage: capture_plans.py <tag> <suffix> [query ...]")
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    import bench
    import __spark_entry__ as entry_mod
    from polars_pipe_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qmap = entry_mod.queries()
    if not names:
        names = [n for n in bench.HEADLINE if n in qmap]
    unknown = [n for n in names if n not in qmap]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name=f"capture_plans_{tag}")
    for name in names:
        spark.catalog.clearCache()
        df = qmap[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
