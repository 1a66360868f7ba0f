#!/usr/bin/env python
"""Machine adjudication of bench noise — the rule that was applied by
hand in rounds 9-11 (q54 straddler, q23 watch, the r11 slow-regime
headline run), now a tool (r11 verdict task 1).

THE RULE (established across SCALING.md/BASELINE.md adjudications):
a query has CROSSED vs the baseline iff

    current/baseline > RATIO_THRESHOLD (1.3)   AND
    current - baseline > the query's OWN best-of-N spread

i.e. a crossing must be both proportionally large and bigger than the
run's own demonstrated measurement noise for that query.

UNIFORM-SHIFT tier (r12): the host's documented bimodal ~15-20% slow
mode inflates EVERY query but is invisible to the CPU-only calibration
probe (it is an IO/scheduler-level regime). A code regression is never
uniform across ~40 unrelated queries, so the adjudicator computes the
MEDIAN per-query ratio over all comparable pairs:

  - median_ratio > UNIFORM_SLOW_THRESHOLD (1.10): the run is tagged
    uniformly slow. Absolute crossings are downgraded to
    crossed-degraded (re-run idle), and the overall verdict can never
    be plain "ok" — a uniformly slow run is not comparable evidence.
  - a query whose ratio RELATIVE to the median (ratio/median_ratio)
    still exceeds the threshold AND whose delta beats its spread
    STANDS OUT from the uniform shift — that stays a hard "crossed"
    (this is what keeps a genuine localized regression detectable even
    inside a slow-mode run).

On top of that, the r12 bench carries a host-regime tag derived from a
fixed-work calibration probe (bench.py:calibration_probe /
CALIB_IDLE_BOUND_S), which catches gross contention (2-5x):

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
import statistics
import sys

RATIO_THRESHOLD = 1.3
# Calibrated on six same-code default runs in one r12 day: fast-mode
# medians 0.94-1.01, slow-mode 1.13-1.18 (BASELINE.md "Uniform-shift
# tier") — 1.10 sits in the gap. A >10% genuinely-uniform code
# regression would read rerun-degraded forever (never ok), which still
# demands investigation rather than passing green.
UNIFORM_SLOW_THRESHOLD = 1.10


def evaluate(
    current: dict,
    baseline: dict,
    ratio_threshold: float = RATIO_THRESHOLD,
    overrides: dict | None = None,
) -> dict:
    """Pure evaluator: two bench payloads -> machine verdicts.

    ``current`` may carry ``spread`` (per-query best-of-N max-min) and
    ``regime`` ("ok"/"degraded", from the calibration probe); both are
    optional — absent spread reads as 0 (strictest), absent regime as
    "unknown" (treated like "ok": crossings stay "crossed").

    ``overrides`` maps query name -> {"value": accepted_seconds, ...}:
    per-query ADJUDICATED baseline replacements for entries the
    committed baseline artifact got stale on (e.g. a fence added after
    the baseline round — q27). Each override must be documented in
    scaling/baseline_overrides.json with its adjudication rationale;
    the CLI auto-loads that file when present."""
    spreads = current.get("spread") or {}
    regime = current.get("regime", "unknown")
    verdicts: dict[str, dict] = {}
    crossed, crossed_degraded, failed, missing = [], [], [], []
    cur_queries = current.get("queries") or {}
    # bench.py replaces the queries dict with {"_see": <sidecar>} when
    # the printed line exceeds the driver tail budget; adjudicating that
    # slim line would mark every baseline query missing-from-current and
    # read "broken" for the wrong reason (r12 ADVICE). Refuse loudly and
    # point at the full sidecar instead.
    if "_see" in cur_queries:
        raise ValueError(
            "current payload is the slim driver line (queries replaced "
            f"by a pointer) — adjudicate the full sidecar instead: "
            f"{cur_queries['_see']}"
        )
    base_queries = dict(baseline.get("queries") or {})
    applied_overrides = {}
    for name, ov in (overrides or {}).items():
        if name in base_queries and isinstance(ov, dict) and "value" in ov:
            base_queries[name] = ov["value"]
            applied_overrides[name] = ov["value"]
    ratios = [
        cur / base_queries[n]
        for n, cur in cur_queries.items()
        if isinstance(cur, (int, float)) and cur >= 0
        and isinstance(base_queries.get(n), (int, float))
        and base_queries[n] > 0
    ]
    median_ratio = statistics.median(ratios) if ratios else 1.0
    # "uniform" needs a sample: a 1-3 query probe run has no median
    # worth the name, and downgrading its only crossing would let a
    # targeted re-measure mask a real regression
    uniform_slow = len(ratios) >= 5 and median_ratio > UNIFORM_SLOW_THRESHOLD
    # a baseline query absent from the current run is itself a red flag
    # (vanished/fenced/renamed) — it must not adjudicate silently green
    for name in base_queries:
        if name not in cur_queries:
            verdicts[name] = {
                "current": None,
                "baseline": base_queries[name],
                "verdict": "missing-from-current",
            }
            missing.append(name)
    for name, cur in cur_queries.items():
        base = base_queries.get(name)
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
            # the relative tier exists to see THROUGH a uniform slow
            # shift; normalising by a sub-1 median would instead inflate
            # ratios on uniformly FAST runs and flag queries that never
            # crossed the absolute rule (r12 ADVICE) — so the divisor
            # never drops below 1
            rel_ratio = ratio / max(median_ratio, 1.0)
            entry.update(
                ratio=round(ratio, 3),
                rel_ratio=round(rel_ratio, 3),
                delta=round(delta, 3),
                spread=spread,
            )
            if rel_ratio > ratio_threshold and delta > spread:
                # stands out even after removing the run's uniform
                # shift — a localized regression, detectable inside a
                # slow-mode run; only a gross-contention (probe-level)
                # regime downgrades it
                if regime == "degraded":
                    entry["verdict"] = "crossed-degraded"
                    crossed_degraded.append(name)
                else:
                    entry["verdict"] = "crossed"
                    crossed.append(name)
            elif ratio > ratio_threshold and delta > spread:
                if regime == "degraded" or uniform_slow:
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
    elif crossed_degraded or uniform_slow:
        # a uniformly slow run is not comparable evidence even with no
        # crossings — demand an idle re-run rather than reading green
        overall = "rerun-degraded"
    else:
        overall = "ok"
    return {
        "regime": regime,
        "calib_s": current.get("calib_s"),
        "calib_bound_s": current.get("calib_bound_s"),
        # r13: the IO/scheduler probe (bench.py io_calibration_probe)
        # folds into `regime` at bench time; carried through so an
        # adjudication shows WHICH probe degraded the run
        "io_calib_s": current.get("io_calib_s"),
        "io_calib_bound_s": current.get("io_calib_bound_s"),
        **(
            {"regime_src": current["regime_src"]}
            if current.get("regime_src")
            else {}
        ),
        "ratio_threshold": ratio_threshold,
        "median_ratio": round(median_ratio, 3),
        "uniform_slow": uniform_slow,
        **(
            {"applied_overrides": applied_overrides}
            if applied_overrides
            else {}
        ),
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
    # adjudicated per-query baseline replacements live next to the tool
    import os  # noqa: PLC0415

    ov_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scaling",
        "baseline_overrides.json",
    )
    overrides = _load(ov_path) if os.path.exists(ov_path) else None
    try:
        report = evaluate(_load(args[0]), _load(args[1]), overrides=overrides)
    except ValueError as e:
        sys.stderr.write(f"noise_rule: {e}\n")
        return 2
    line = json.dumps(report, indent=1)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0 if report["overall"] not in ("regressed", "broken") else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
