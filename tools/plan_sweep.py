"""Anti-pattern sweep over every registered query's PHYSICAL plan.

Walks ``__spark_entry__.queries()`` at a small scale factor, builds each
DataFrame (no action beyond what query construction itself performs), and
scans the executed-plan string for the two plan shapes that kill a job at
100 TB regardless of how fast they run at bench scale:

- **Global (partition-less) window** — ``WindowExec`` with no partition
  spec moves EVERY row through one reducer ("Exchange SinglePartition").
  Detected from the plan string: a ``Window``/``WindowGroupLimit`` node
  whose bracket groups carry only an ORDER spec (``ASC``/``DESC``) and no
  partition-column group. Queries that run such a window over a frame that
  is BOUNDED by construction (e.g. a counting-sort axis of ≤ ~31 rows, a
  percentile lookup over an aggregated handful) are declared in
  ``BOUNDED_GLOBAL_WINDOW`` with the bound — the sweep enforces that every
  exemption carries a documented reason, not that none exist.
- **Shuffle cartesian** — a ``CartesianProduct`` node (the non-broadcast
  product). The broadcast form (``BroadcastNestedLoopJoin``) is fine: the
  small side is bounded by the broadcast-size guard.

Usage: ``python tools/plan_sweep.py [query ...]`` (default: all).
Exit code 1 if any non-exempt query trips a rule. Also importable —
``sweep(spark, sf_dir, names)`` returns {name: [finding, ...]}.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Queries with a deliberately global window over a frame whose size is
# bounded by CONSTRUCTION (value: the bound and why). The sweep fails on
# any global window not declared here, so adding a query to this table is
# a reviewed act, not a silent regression.
BOUNDED_GLOBAL_WINDOW: dict[str, str] = {
    "q54_vocab_topk": (
        "rank window runs AFTER orderBy().limit(20) — frame is exactly 20 "
        "rows regardless of corpus size (the heavy top-k itself plans "
        "TakeOrderedAndProject, not a global sort)"
    ),
    "q157_temperature_mixture": (
        "sum-over-() windows run on the one-row-per-SOURCE weight frame — "
        "bounded by domain count, not corpus size"
    ),
    "q172_mixing_schedule": (
        "same one-row-per-source weight frame as q157"
    ),
    "q117_running_distinct_users": (
        "cumulative sum runs on the one-row-per-DAY first-seen frame — "
        "bounded by calendar days in the corpus, not by user or event count"
    ),
    "q232_time_to_convert": (
        "cumulative windows run on the lag-days counting-sort axis — "
        "bounded by the event window in days (≤ ~31 rows), never per-user "
        "or per-event data"
    ),
    "q238_eval_allocation": (
        "leftover-seat ranking runs on the one-row-per-SOURCE quota frame "
        "— bounded by domain count (the q157 shape)"
    ),
    "q274_survival_hazard": (
        "reverse cumulative + the KM fold's collect both run on the "
        "one-row-per-TENURE-WEEK life table — bounded by the observation "
        "span in weeks (~5 rows)"
    ),
    "q257_sql_surface": (
        "RANK() runs on the one-row-per-NATION revenue aggregate (25 "
        "rows, bounded by the nation dimension)"
    ),
    "q255_mann_whitney": (
        "same hierarchical-prefix-sum shape as q239: the only global "
        "window is the one-row-per-500-cent-range offset level (~100 rows)"
    ),
    "q239_ks_drift": (
        "the range-offset cumulative runs on the one-row-per-500-cent-"
        "RANGE frame — bounded by the value domain (~100 rows), the "
        "top level of a hierarchical prefix sum; the per-cent cumulative "
        "is range-partitioned"
    ),
}

_WINDOW_RE = re.compile(r"^(Window|WindowGroupLimit|WindowSort)\b")


def _bracket_groups(s: str) -> list[str]:
    """Split a plan-node argument string into its top-level [...] groups."""
    groups, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _node_lines(plan: str) -> list[str]:
    out = []
    for raw in plan.splitlines():
        # strip tree-drawing prefix (indent, +-, :-, :, |)
        m = re.match(r"^[\s:+|-]*(\*?\(\d+\)\s*)?([A-Za-z].*)$", raw)
        if m:
            out.append(m.group(2))
    return out


def find_antipatterns(plan: str) -> list[str]:
    findings = []
    for line in _node_lines(plan):
        name = line.split(" ", 1)[0].split("[", 1)[0]
        if name == "CartesianProduct":
            findings.append("shuffle cartesian (CartesianProduct)")
        if _WINDOW_RE.match(line) and name == "Window":
            groups = _bracket_groups(line)
            # groups: [functions], [partition spec]?, [order spec]?
            # a partition spec group has plain column refs, no ASC/DESC;
            # global windows are missing exactly that group.
            tail = groups[1:]
            has_partition = any(
                g and not re.search(r"\b(ASC|DESC)\b", g) for g in tail
            )
            if not has_partition:
                findings.append(f"global window (no partition spec): {line[:120]}")
    return findings


def sweep(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    import __spark_entry__ as entry

    qs = entry.queries()
    names = names or sorted(qs)
    results: dict[str, list[str]] = {}
    for name in names:
        if name not in qs:
            results[name] = ["NOT IN queries()"]
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            results[name] = [f"PLAN BUILD FAILED: {type(e).__name__}: {e}"]
            continue
        bad = find_antipatterns(plan)
        if bad and name in BOUNDED_GLOBAL_WINDOW:
            bad = [b for b in bad if not b.startswith("global window")]
        if bad:
            results[name] = bad
    return results


def main() -> int:
    from polars_pipe_spark import get_spark

    sf_dir = "/root/testdata/sf0.001"
    spark = get_spark()
    results = sweep(spark, sf_dir, sys.argv[1:] or None)
    for name, findings in sorted(results.items()):
        for f in findings:
            print(f"{name}: {f}")
    print(f"\n{len(results)} flagged")
    return 1 if results else 0


if __name__ == "__main__":
    sys.exit(main())
