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

Each input must carry its ``sf`` field (bench.py records it).
"""

from __future__ import annotations

import json
import math
import sys


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


def main() -> int:
    args = [a for a in sys.argv[1:]]
    floor = 1.0
    md_path = None
    if "--floor" in args:
        i = args.index("--floor")
        floor = float(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--md" in args:
        i = args.index("--md")
        md_path = args[i + 1]
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
    return 1 if n_super else 0


if __name__ == "__main__":
    sys.exit(main())
