"""Scaling-ladder regression gate (r8 VERDICT item 2).

The r8 round found six 100×-scale-killers by MEASURING the sf0.1→sf3
ladder; this test makes that discipline survive future rounds without a
human re-reading the table: the committed rungs under ``scaling/`` must
stay within the accepted summary (``scaling/LADDER.json``). Committing a
re-run with a worsened exponent (>0.15) or a sub-second query crossing
1 s at the top rung fails here until the summary is consciously
regenerated with ``--write-summary`` — leaving a reviewable diff.
"""

from __future__ import annotations

import glob
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from scaling_report import build_rows, gate, load, summarize  # noqa: E402

LADDER = os.path.join(REPO, "scaling", "LADDER.json")


def _committed_rungs() -> list[str]:
    """The newest committed ladder: highest-numbered round's rungs."""
    paths = glob.glob(os.path.join(REPO, "scaling", "bench_sf*_r*.json"))
    assert paths, "no committed ladder rungs under scaling/"
    rounds = {p.rsplit("_r", 1)[1].split(".json")[0] for p in paths}
    newest = max(rounds, key=int)
    return sorted(p for p in paths if p.endswith(f"_r{newest}.json"))


class TestScalingGate:
    def test_committed_ladder_within_accepted_summary(self):
        rungs = _committed_rungs()
        assert len(rungs) >= 2, f"need >=2 rungs to form a ladder: {rungs}"
        _, rows = build_rows([load(p) for p in rungs], floor=1.0)
        with open(LADDER) as f:
            baseline = json.load(f)
        violations = gate(rows, baseline)
        assert not violations, "\n".join(violations)

    def test_gate_is_red_on_worsened_artifact(self):
        """The gate must actually FIRE: synthetically slow the top rung
        of a real sublinear query until its exponent worsens past the
        slack, and separately push an overhead query past 1 s."""
        rungs = _committed_rungs()
        runs = [load(p) for p in rungs]
        with open(LADDER) as f:
            baseline = json.load(f)
        sublinear = [
            n for n, b in baseline.items()
            if b["exponent"] is not None and b["label"].startswith(("sublinear", "linear"))
        ]
        overhead = [n for n, b in baseline.items() if b["label"].startswith("overhead")]
        assert sublinear and overhead, baseline
        victim_exp, victim_ovh = sublinear[0], overhead[0]
        sf_top = max(sf for sf, qs in runs if victim_exp in qs)
        worsened = [
            (sf, {**qs,
                  **({victim_exp: qs[victim_exp] * 8.0} if sf == sf_top and victim_exp in qs else {}),
                  **({victim_ovh: 2.5} if sf == sf_top and victim_ovh in qs else {})})
            for sf, qs in runs
        ]
        _, rows = build_rows(worsened, floor=1.0)
        violations = gate(rows, baseline)
        assert any(victim_exp in v and "exponent" in v for v in violations), violations
        assert any(victim_ovh in v and "crossed" in v for v in violations), violations

    def test_gate_flags_vanished_query(self):
        rungs = _committed_rungs()
        runs = [load(p) for p in rungs]
        with open(LADDER) as f:
            baseline = json.load(f)
        victim = sorted(baseline)[0]
        pruned = [(sf, {k: v for k, v in qs.items() if k != victim}) for sf, qs in runs]
        _, rows = build_rows(pruned, floor=1.0)
        violations = gate(rows, baseline)
        assert any(victim in v and "missing" in v for v in violations), violations

    def test_summary_matches_committed_rungs(self):
        """LADDER.json must be the summary OF the committed rungs — a
        stale summary (rungs re-run, summary forgotten) is itself a
        failure, in the same registry==artifact spirit as the
        correctness close-out test."""
        rungs = _committed_rungs()
        _, rows = build_rows([load(p) for p in rungs], floor=1.0)
        want = summarize(rows, 0.0)
        with open(LADDER) as f:
            got = json.load(f)
        assert got == json.loads(json.dumps(want)), (
            "scaling/LADDER.json is stale — regenerate with "
            "tools/scaling_report.py <rungs> --write-summary scaling/LADDER.json"
        )
