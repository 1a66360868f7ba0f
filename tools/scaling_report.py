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
    runs = sorted(runs)
    sf_lo, q_lo = runs[0]
    sf_hi, q_hi = runs[-1]
    rows = []
    for name in sorted(set(q_lo) & set(q_hi)):
        t_lo, t_hi = q_lo[name], q_hi[name]
        mids = [
            (sf, qs[name]) for sf, qs in runs[1:-1] if name in qs
        ]
        if t_hi < floor:
            label, exp = "overhead", None
        else:
            exp = exponent(t_lo, t_hi, sf_lo, sf_hi)
            label = (
                "sublinear" if exp < 0.8
                else "linear" if exp <= 1.25
                else "SUPERLINEAR"
            )
        rows.append((name, t_lo, mids, t_hi, exp, label))
    return sf_lo, sf_hi, rows


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
    runs = [load(p) for p in args]
    sf_lo, sf_hi, rows = build_rows(runs, floor)
    mid_sfs = [sf for sf, _ in sorted(runs)[1:-1]]

    hdr = ["query", f"t(sf{sf_lo:g})"]
    hdr += [f"t(sf{sf:g})" for sf in mid_sfs]
    hdr += [f"t(sf{sf_hi:g})", "exponent", "verdict"]
    lines = ["| " + " | ".join(hdr) + " |",
             "|" + "|".join("---" for _ in hdr) + "|"]
    n_super = 0
    for name, t_lo, mids, t_hi, exp, label in rows:
        cells = [name, f"{t_lo:.2f}"]
        cells += [f"{t:.2f}" for _, t in mids]
        cells += [f"{t_hi:.2f}", "—" if exp is None else f"{exp:.2f}", label]
        lines.append("| " + " | ".join(cells) + " |")
        if label == "SUPERLINEAR":
            n_super += 1
    table = "\n".join(lines)
    print(table)
    print(f"\n{len(rows)} queries, {n_super} superlinear "
          f"(floor {floor}s at sf{sf_hi:g})")
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
