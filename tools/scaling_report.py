#!/usr/bin/env python
"""Scale-factor ladder report (r6 VERDICT task 4).

Reads two or more bench JSON lines (the ``bench.py`` output format)
measured at DIFFERENT scale factors over schema-identical data
(``tools/gen_testdata.py`` fixtures, so both points share one data
distribution) and emits a per-query scaling table:

    exponent = log(t_hi / t_lo) / log(sf_hi / sf_lo)

An exponent near 1.0 is linear scaling; near 0 is overhead-dominated
(the query is too cheap at these SFs for its data-dependent cost to
show); meaningfully ABOVE 1 (with times big enough to trust) is the
signal a plan degrades super-linearly and needs investigation.

Times below ``--floor`` seconds at the HIGH scale factor are labeled
``overhead`` instead of getting an exponent: at sub-second wall-clock,
JVM/scheduling noise exceeds the data-dependent cost and the ratio is
meaningless.

Usage:
    python tools/scaling_report.py low.json high.json [more.json ...]
        [--floor 1.0] [--md SCALING.md]
        [--write-summary scaling/LADDER.json] [--gate scaling/LADDER.json]

Each input must carry its ``sf`` field (bench.py records it).

Regression gate (r8 VERDICT item 2): ``--write-summary PATH`` records
the accepted per-query exponents/top-rung times; ``--gate PATH`` diffs a
ladder against that summary and exits non-zero when any query's exponent
worsens by more than GATE_EXP_SLACK (0.15) or a query that was sub-second
at the top rung crosses 1 s there. The slow-lane pytest
(tests/test_scaling_gate.py) runs the gate over the COMMITTED rungs, so
re-running the ladder and committing worse rungs without consciously
regenerating the summary fails CI — the measure-then-fix discipline that
caught r8's six interpreted-HOF scale-killers no longer depends on a
human re-reading the table.
"""

from __future__ import annotations

import json
import math
import sys

GATE_EXP_SLACK = 0.15
GATE_TOP_FLOOR = 1.0


def load(path: str) -> tuple[float, dict[str, float]]:
    with open(path) as f:
        d = json.load(f)
    return float(d["sf"]), dict(d["queries"])


def exponent(t_lo: float, t_hi: float, sf_lo: float, sf_hi: float) -> float:
    return math.log(t_hi / t_lo) / math.log(sf_hi / sf_lo)


def build_rows(runs: list[tuple[float, dict[str, float]]], floor: float):
    """One row per query seen at ANY rung (no silent drops: a query
    excluded from the top rung — e.g. an intentionally-quadratic exact
    baseline skipped via SPARK_GRAFT_BENCH_SKIP — still gets a row, its
    exponent computed over the rungs it DID run, and a ``to sf<X>``
    marker showing how high it climbed)."""
    runs = sorted(runs)
    sf_top = runs[-1][0]
    all_names = sorted(set().union(*[set(qs) for _, qs in runs]))
    rows = []
    for name in all_names:
        pts = {sf: qs[name] for sf, qs in runs if name in qs}
        sfs = sorted(pts)
        if len(sfs) < 2:
            rows.append((name, pts, None, "one-point"))
            continue
        s0, s1 = sfs[0], sfs[-1]
        if pts[s1] < floor:
            label, exp = "overhead", None
        else:
            exp = exponent(pts[s0], pts[s1], s0, s1)
            label = (
                "sublinear" if exp < 0.8
                else "linear" if exp <= 1.25
                else "SUPERLINEAR"
            )
        if s1 != sf_top:
            label += f" (to sf{s1:g})"
        rows.append((name, pts, exp, label))
    return runs, rows


def summarize(rows, sf_top: float) -> dict:
    """The accepted-ladder summary ``--write-summary`` persists: one
    entry per query with its endpoint exponent and top-rung time."""
    out = {}
    for name, pts, exp, label in rows:
        s1 = max(pts)
        out[name] = {
            "exponent": None if exp is None else round(exp, 4),
            "t_top": pts[s1],
            "sf_top": s1,
            "label": label,
        }
    return out


def gate(rows, baseline: dict) -> list[str]:
    """Compare a ladder against the accepted summary. Returns the list
    of violations (empty = pass):

    - exponent worsened by more than GATE_EXP_SLACK versus the summary
      (both measured at the same top rung — a ladder climbing HIGHER
      than the baseline gets fresh eyes, not an apples-to-oranges diff);
    - a query that was sub-second at the top rung (label ``overhead`` /
      t_top < 1 s) now takes >= GATE_TOP_FLOOR seconds there — the
      "fixed cost stopped hiding it" trigger;
    - a query in the summary vanished from the ladder entirely (silent
      drops hide regressions the same way silent caps hide misses).
    """
    current = summarize(rows, 0.0)
    bad = []
    for name, base in baseline.items():
        cur = current.get(name)
        if cur is None:
            bad.append(f"{name}: in accepted summary but missing from ladder")
            continue
        if cur["sf_top"] != base["sf_top"]:
            continue  # different rung heights — not comparable
        b_exp, c_exp = base["exponent"], cur["exponent"]
        if b_exp is not None and c_exp is not None and c_exp > b_exp + GATE_EXP_SLACK:
            bad.append(
                f"{name}: exponent {c_exp:.2f} worsened past accepted "
                f"{b_exp:.2f} + {GATE_EXP_SLACK}"
            )
        if base["t_top"] < GATE_TOP_FLOOR <= cur["t_top"]:
            bad.append(
                f"{name}: top-rung time {cur['t_top']:.2f}s crossed "
                f"{GATE_TOP_FLOOR}s (accepted {base['t_top']:.2f}s at "
                f"sf{base['sf_top']:g})"
            )
    return bad


def main() -> int:
    args = [a for a in sys.argv[1:]]
    floor = 1.0
    md_path = None
    summary_path = None
    gate_path = None
    if "--floor" in args:
        i = args.index("--floor")
        floor = float(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--md" in args:
        i = args.index("--md")
        md_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--write-summary" in args:
        i = args.index("--write-summary")
        summary_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--gate" in args:
        i = args.index("--gate")
        gate_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) < 2:
        print(__doc__)
        return 2
    runs, rows = build_rows([load(p) for p in args], floor)
    rung_sfs = [sf for sf, _ in runs]

    hdr = ["query"] + [f"t(sf{sf:g})" for sf in rung_sfs] + ["exponent", "verdict"]
    lines = ["| " + " | ".join(hdr) + " |",
             "|" + "|".join("---" for _ in hdr) + "|"]
    n_super = 0
    for name, pts, exp, label in rows:
        cells = [name]
        cells += [f"{pts[sf]:.2f}" if sf in pts else "skip" for sf in rung_sfs]
        cells += ["—" if exp is None else f"{exp:.2f}", label]
        lines.append("| " + " | ".join(cells) + " |")
        if label.startswith("SUPERLINEAR"):
            n_super += 1
    table = "\n".join(lines)
    print(table)
    print(f"\n{len(rows)} queries, {n_super} superlinear "
          f"(floor {floor}s at each query's top rung)")
    if md_path:
        with open(md_path) as f:
            doc = f.read()
        start = doc.index("<!-- ladder:start -->")
        end = doc.index("<!-- ladder:end -->")
        doc = (doc[: start + len("<!-- ladder:start -->")]
               + "\n" + table + "\n" + doc[end:])
        with open(md_path, "w") as f:
            f.write(doc)
        print(f"updated {md_path}")
    if summary_path:
        with open(summary_path, "w") as f:
            json.dump(summarize(rows, rung_sfs[-1]), f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote accepted-ladder summary {summary_path}")
    if gate_path:
        with open(gate_path) as f:
            baseline = json.load(f)
        violations = gate(rows, baseline)
        for v in violations:
            print(f"GATE: {v}")
        if violations:
            return 3
        print(f"gate vs {gate_path}: PASS ({len(baseline)} accepted queries)")
    return 1 if n_super else 0


if __name__ == "__main__":
    sys.exit(main())
