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
- **Unpersisted multi-scan** (r6 VERDICT task 6, the SURVEY §3.4
  recompute hazard) — the same parquet location scanned ≥ 3× by LIVE
  FileScan nodes (scans under an ``InMemoryRelation`` are cached-lineage
  printouts, not executed work). Two or fewer is the ordinary self-join
  shape; three-plus usually means a shared DERIVED frame is re-deriving
  its whole lineage per consumer and wants a ``.persist()``. Queries
  where the multi-scan is the RIGHT call at 100 TB (independent
  aggregates over raw pruned scans, where pinning would cache more
  bytes than the scans read) are declared in ``MULTI_SCAN_OK`` with the
  reason — same reviewed-exemption contract as the window rule. The
  sweep calls ``spark.catalog.clearCache()`` before each query build so
  leftover caches from earlier queries can't mask or fake a finding.

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

# Queries whose >= 3x same-location live scans are the RIGHT 100 TB
# shape (value: why re-scan beats persist there). Everything else that
# trips the multi-scan rule must grow a .persist() on the shared frame.
MULTI_SCAN_OK: dict[str, str] = {
    "q52_merge_upsert": (
        "3 pruned scans of orders: target, matched-update, insert "
        "branches of the merge each push different filters — persisting "
        "the raw target would cache the full table"
    ),
    "q61_fuzzy_join": (
        "blocked self-join over customer: both candidate sides plus the "
        "per-block counts scan raw pruned columns; the block frame is "
        "corpus-scale, re-scan with pushdown is cheaper than pinning it"
    ),
    "q94_dup_spans": (
        "3 raw scans: span explode, partner explode, and doc-length "
        "projection — the exploded span frame is ~10x corpus and must "
        "NOT be pinned; re-derive is the measured winner (dedup.py:206)"
    ),
    "q106_table_expectations": (
        "each expectation is an independent aggregate over lineitem "
        "with its own pushed filter/columns — a pinned superset frame "
        "would read every column for all of them"
    ),
    "q116_robust_outliers": (
        "median/MAD/flag stages re-scan one numeric column with "
        "pushdown; the intermediate percentile frames are 1-row"
    ),
    "q125_bm25_topk": (
        "bm25's documented 3-pass shape: token explode, semi-join-"
        "pruned feature pass, corpus-stats pass (retrieval.py:61-88 "
        "records the measured alternatives)"
    ),
    "q129_rerank": "same bm25 3-pass shape as q125 plus the rank stage",
    "q131_unigram_logprob": (
        "vocab pass + token pass + per-doc pass over documents: the "
        "exploded token frame is ~10x corpus, re-derive beats pinning"
    ),
    "q134_training_pairs": (
        "composes rerank (bm25 3-pass) + candidate anti-join + negative "
        "pool, each a raw pruned scan; the only shared derived frames "
        "live inside bm25_scores which already single-passes them"
    ),
    "q137_ivf_pretrained": (
        "IVF assign + search: raw embedding scans with different "
        "pushed vec_id filters; the repeated frame is the 16-row "
        "centroid scan (broadcast, trivially cheap)"
    ),
    "q142_psi_drift": (
        "reference/current populations + bin edges are independent "
        "pruned aggregates of one numeric column"
    ),
    "q150_corpus_funnel": (
        "funnel stages are independent counts over raw pruned scans "
        "with different filters; pinning the near-corpus-size kept "
        "frame would dwarf the scans"
    ),
    "q154_ivf_incremental": (
        "existing/new ingest slices + 16-row centroid frame: raw "
        "pruned scans with disjoint pushed filters"
    ),
    "q155_corpus_health": (
        "dashboard of independent aggregates (counts, contamination, "
        "gram novelty) over raw pruned scans; the gram explode is ~10x "
        "corpus and must not be pinned (the q27 measured lesson)"
    ),
    "q160_fuzzy_join": "same blocked-self-join shape as q61",
    "q163_oov_rate": (
        "vocab pass + OOV pass + per-doc totals: token explode re-"
        "derive beats pinning the exploded frame (q131's reasoning)"
    ),
    "q187_cooccurrence_pairs": (
        "vocab + two pair sides over the token explode: the explode is "
        "~10x corpus; bounded vocab is broadcast, the rest re-derives"
    ),
    "q195_matryoshka_recall": (
        "two independent brute-force rankings (full-dim and truncated) "
        "plus the query slice — every frame is consumed once; the "
        "scans differ in pushed columns/filters"
    ),
    "q219_rolling_wau": (
        "per-day frames at 4 window offsets: each is a pruned "
        "(date,user) scan with its own pushed date filter — the "
        "classic case where pushdown beats pinning"
    ),
    "q225_token_source_pmi": (
        "token/source marginals + joint counts over the token explode "
        "— explode re-derive beats pinning (q131's reasoning)"
    ),
    "q239_ks_drift": (
        "two sample populations + the range spine are independent "
        "pruned scans of one value column"
    ),
    "q251_simhash_banded": (
        "signature pass + band pass + verify sides over documents — "
        "the signature frame re-derive is the measured winner at this "
        "sketch width (dedup.py:206's recompute-vs-persist note)"
    ),
    "q267_er_evaluation": (
        "gold pairs + predicted pairs + per-block counts: three pruned "
        "scans of customer with different pushed filters"
    ),
    "q269_bloom_fpr": (
        "member/non-member populations + the filter-build scan are "
        "independent pruned scans of events"
    ),
    "q173_retrieval_eval": (
        "rerank's bm25 3-pass shape (see q125) plus ONE relevance "
        "explode; the doubly-consumed relevance frame is persisted"
    ),
    "q181_ann_dashboard": (
        "three ANN method pipelines + the query slice each scan "
        "embeddings with their own pruning, all single-use; the 4x-"
        "consumed exact frame is persisted"
    ),
    "q183_incremental_neardup": (
        "batch side, index side and the final id projection are three "
        "single-use pruned scans; the doubly-consumed batch frames are "
        "persisted inside incremental_near_dups"
    ),
}

_WINDOW_RE = re.compile(r"^(Window|WindowGroupLimit|WindowSort)\b")
_LOC_RE = re.compile(r"Location: [^\[]*\[([^\]]*)\]")
MULTI_SCAN_THRESHOLD = 3


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


def live_scan_locations(plan: str) -> list[str]:
    """Parquet locations of FileScan nodes NOT under an
    ``InMemoryRelation`` — i.e. scans the plan would actually execute
    (a cached relation prints its ORIGIN lineage, including its
    FileScan, but serves rows from the block store). Tree membership is
    recovered from the indent structure: a node is a descendant while
    its printed prefix is longer than the ancestor's."""
    out: list[str] = []
    stack: list[tuple[int, bool]] = []
    for raw in plan.splitlines():
        m = re.match(r"^([\s:+|-]*)(\*?\(\d+\)\s*)?([A-Za-z].*)$", raw)
        if not m:
            continue
        depth = len(m.group(1)) + len(m.group(2) or "")
        text = m.group(3)
        while stack and stack[-1][0] >= depth:
            stack.pop()
        under_cache = any(cached for _, cached in stack)
        stack.append((depth, text.startswith("InMemoryRelation")))
        if text.startswith("FileScan") and not under_cache:
            lm = _LOC_RE.search(raw)
            out.append(lm.group(1) if lm else text[:80])
    return out


def find_multi_scans(plan: str) -> list[str]:
    from collections import Counter

    counts = Counter(live_scan_locations(plan))
    return [
        f"unpersisted multi-scan: {loc.rsplit('/', 1)[-1]} live-scanned "
        f"{n}x in one plan"
        for loc, n in sorted(counts.items())
        if n >= MULTI_SCAN_THRESHOLD
    ]


# Nodes that bound the frame a global window runs over: an explicit
# limit/top-k, or an aggregation that reduces the corpus to its group
# domain (the day-grain / per-source shapes). r12 verdict task 5: the
# bounded-global-window convention was comment-guarded per query; this
# enforces it by STRUCTURE — every partition-less Window must sit above
# one of these in its own input subtree, whitelisted name or not.
_BOUNDING_NODES = re.compile(
    r"^(TakeOrderedAndProject|GlobalLimit|CollectLimit|LocalLimit|"
    r"HashAggregate|SortAggregate|ObjectHashAggregate)\b"
)


def _plan_tree(plan: str) -> list[tuple[int, str]]:
    """(depth, node-text) pairs using the printed indent structure."""
    out: list[tuple[int, str]] = []
    for raw in plan.splitlines():
        m = re.match(r"^([\s:+|-]*)(\*?\(\d+\)\s*)?([A-Za-z].*)$", raw)
        if m:
            out.append((len(m.group(1)) + len(m.group(2) or ""), m.group(3)))
    return out


def _is_global_window(line: str) -> bool:
    name = line.split(" ", 1)[0].split("[", 1)[0]
    if name != "Window":
        return False
    tail = _bracket_groups(line)[1:]
    return not any(g and not re.search(r"\b(ASC|DESC)\b", g) for g in tail)


def unbounded_global_windows(plan: str) -> list[str]:
    """Partition-less Window nodes with NO bounding node beneath them.

    A global window is structurally safe only when its input subtree
    contains a limit/top-k or an aggregate (frame already reduced to a
    bounded domain before the single-reducer window). Returns a finding
    per violating node; an empty list means every global window in the
    plan is bounded by construction."""
    tree = _plan_tree(plan)
    findings = []
    for i, (depth, text) in enumerate(tree):
        if not _is_global_window(text):
            continue
        subtree = []
        for d2, t2 in tree[i + 1 :]:
            if d2 <= depth:
                break
            subtree.append(t2)
        if not any(_BOUNDING_NODES.match(t) for t in subtree):
            findings.append(
                f"UNBOUNDED global window (no limit/agg beneath): {text[:110]}"
            )
    return findings


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
        # deterministic cache state: a leftover cache from an earlier
        # query can both HIDE a multi-scan (its scans print as cached
        # lineage) and FAKE one (an unpersist cascade drops this
        # query's own cache registration)
        spark.catalog.clearCache()
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            results[name] = [f"PLAN BUILD FAILED: {type(e).__name__}: {e}"]
            continue
        bad = find_antipatterns(plan)
        if bad and name in BOUNDED_GLOBAL_WINDOW:
            bad = [b for b in bad if not b.startswith("global window")]
        # structural check runs REGARDLESS of the name table: a declared
        # exemption whose plan lost its bounding node (refactor erosion)
        # must fail the sweep, not ride the stale declaration
        bad += unbounded_global_windows(plan)
        if name not in MULTI_SCAN_OK:
            bad += find_multi_scans(plan)
        if bad:
            results[name] = bad
    spark.catalog.clearCache()
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
