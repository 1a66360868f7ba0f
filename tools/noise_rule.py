#!/usr/bin/env python
"""Machine adjudication of bench noise — the rule that was applied by
hand in rounds 9-11 (q54 straddler, q23 watch, the r11 slow-regime
headline run), now a tool (r11 verdict task 1).

THE RULE (established across SCALING.md/BASELINE.md adjudications):
a query has CROSSED vs the baseline iff

    current/baseline > RATIO_THRESHOLD (1.3)   AND
    current - baseline > the query's OWN best-of-N spread

i.e. a crossing must be both proportionally large and bigger than the
run's own demonstrated measurement noise for that query.  On top of
that, the r12 bench carries a host-regime tag derived from a fixed-work
calibration probe (see bench.py:calibration_probe / CALIB_IDLE_BOUND_S):

    verdict per query:
      ok                  — not crossed
      crossed             — crossed in an "ok"-regime run: a real
                            regression, investigate the plan
      crossed-degraded    — crossed, but the run's calibration probe
                            shows host contention: re-run on an idle
                            host before treating as a regression
      failed              — current timing is the -1 failure sentinel
      no-baseline         — query absent from the baseline artifact
      missing-from-current — baseline query absent from the current run
                            (vanished/fenced/renamed — never silently ok)

    overall:
      ok                  — nothing crossed, nothing broken
      broken              — >=1 failed or missing-from-current: the
                            benchmark itself is not evidence; fix the
                            run before reading any timing out of it
      regressed           — >=1 "crossed" in a clean regime
      rerun-degraded      — crossings exist but ALL are in a degraded
                            regime: the artifact is not evidence of a
                            regression; re-bench idle

    exit code: 0 for ok / rerun-degraded, 1 for regressed / broken.

Usage:
    python tools/noise_rule.py CURRENT.json BASELINE.json [--json OUT]

CURRENT/BASELINE are bench payload files (one JSON object; the full
sidecar ``scaling/bench_last_run_full.json`` / ``bench_latest.json``
carry the spread dict; the short driver line works too — missing
spreads are treated as 0, i.e. the strictest reading).
"""

from __future__ import annotations

import json
import sys

RATIO_THRESHOLD = 1.3


def evaluate(current: dict, baseline: dict, ratio_threshold: float = RATIO_THRESHOLD) -> dict:
    """Pure evaluator: two bench payloads -> machine verdicts.

    ``current`` may carry ``spread`` (per-query best-of-N max-min) and
    ``regime`` ("ok"/"degraded", from the calibration probe); both are
    optional — absent spread reads as 0 (strictest), absent regime as
    "unknown" (treated like "ok": crossings stay "crossed")."""
    spreads = current.get("spread") or {}
    regime = current.get("regime", "unknown")
    verdicts: dict[str, dict] = {}
    crossed, crossed_degraded, failed, missing = [], [], [], []
    cur_queries = current.get("queries") or {}
    # a baseline query absent from the current run is itself a red flag
    # (vanished/fenced/renamed) — it must not adjudicate silently green
    for name in (baseline.get("queries") or {}):
        if name not in cur_queries:
            verdicts[name] = {
                "current": None,
                "baseline": baseline["queries"][name],
                "verdict": "missing-from-current",
            }
            missing.append(name)
    for name, cur in cur_queries.items():
        base = (baseline.get("queries") or {}).get(name)
        entry: dict = {"current": cur, "baseline": base}
        if not isinstance(cur, (int, float)) or cur < 0:
            entry["verdict"] = "failed"
            failed.append(name)
        elif not isinstance(base, (int, float)) or base <= 0:
            entry["verdict"] = "no-baseline"
        else:
            ratio = cur / base
            delta = cur - base
            # `or 0.0` also covers an explicit null spread (a value
            # merged from another run without its spread measurement)
            spread = spreads.get(name) or 0.0
            entry.update(
                ratio=round(ratio, 3), delta=round(delta, 3), spread=spread
            )
            if ratio > ratio_threshold and delta > spread:
                if regime == "degraded":
                    entry["verdict"] = "crossed-degraded"
                    crossed_degraded.append(name)
                else:
                    entry["verdict"] = "crossed"
                    crossed.append(name)
            else:
                entry["verdict"] = "ok"
        verdicts[name] = entry
    # failed/missing outrank everything: a broken benchmark is not
    # evidence of anything, least of all "ok" (a run whose queries all
    # crash must never exit green)
    if failed or missing:
        overall = "broken"
    elif crossed:
        overall = "regressed"
    elif crossed_degraded:
        overall = "rerun-degraded"
    else:
        overall = "ok"
    return {
        "regime": regime,
        "calib_s": current.get("calib_s"),
        "calib_bound_s": current.get("calib_bound_s"),
        "ratio_threshold": ratio_threshold,
        "overall": overall,
        "crossed": sorted(crossed),
        "crossed_degraded": sorted(crossed_degraded),
        "failed": sorted(failed),
        "missing_from_current": sorted(missing),
        "verdicts": verdicts,
    }


def _load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read())


def main(argv: list[str]) -> int:
    out_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.stderr.write("--json requires an output path\n")
            return 2
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        sys.stderr.write("usage: noise_rule.py CURRENT BASELINE [--json OUT]\n")
        return 2
    report = evaluate(_load(args[0]), _load(args[1]))
    line = json.dumps(report, indent=1)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0 if report["overall"] not in ("regressed", "broken") else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
