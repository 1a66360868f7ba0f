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
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from scaling_report import build_rows, gate, load, summarize  # noqa: E402

LADDER = os.path.join(REPO, "scaling", "LADDER.json")


def _newest_round_rungs(pattern: str) -> list[str]:
    """The newest committed rungs for a glob: highest INTEGER round.

    Non-integer round suffixes (e.g. ``sweep_sf0.1_r14_opt_after.json``,
    a same-window A/B probe artifact, not a gated sweep rung) are
    ignored rather than crashing ``int()`` (r14 verdict item 1)."""
    paths = glob.glob(os.path.join(REPO, "scaling", pattern))
    rounds = {
        tok for p in paths
        if re.fullmatch(r"\d+", tok := p.rsplit("_r", 1)[1].split(".json")[0])
    }
    assert rounds, f"no committed integer-round rungs matching {pattern}"
    newest = max(rounds, key=int)
    return sorted(p for p in paths if p.endswith(f"_r{newest}.json"))


def _committed_rungs() -> list[str]:
    """The newest committed ladder: highest-numbered round's rungs."""
    return _newest_round_rungs("bench_sf*_r*.json")


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


SWEEP = os.path.join(REPO, "scaling", "SWEEP.json")


def _committed_sweeps() -> list[str]:
    """The newest committed FULL-REGISTRY sweep rungs (r9 verdict item 2:
    the 280-query sweeps were the instrument that caught q61/q160/q176/
    q250/q90/q230, but only the headline ladder was gated — a future
    round could silently re-introduce a non-headline scale defect)."""
    return _newest_round_rungs("sweep_sf*_r*.json")


class TestSweepGate:
    """Same gate machinery as the headline ladder, applied to the
    full-registry sf0.1→sf1 sweeps and their accepted summary
    ``scaling/SWEEP.json`` — every registered query now has a gated
    scaling exponent, not just the ~40 headliners."""

    def test_committed_sweep_within_accepted_summary(self):
        rungs = _committed_sweeps()
        assert len(rungs) >= 2, f"need >=2 sweep rungs: {rungs}"
        _, rows = build_rows([load(p) for p in rungs], floor=1.0)
        with open(SWEEP) as f:
            baseline = json.load(f)
        violations = gate(rows, baseline)
        assert not violations, "\n".join(violations)

    def test_sweep_covers_every_registered_query(self):
        """A query missing from the sweep has NO gated exponent — the
        exact blind spot the r9 verdict called out. Fenced exact
        baselines (q27/q211 raise their pair fence at sf1) may run only
        the low rung; they must still appear there."""
        import __spark_entry__ as entry_mod

        rungs = _committed_sweeps()
        runs = [load(p) for p in rungs]
        seen = set().union(*[set(qs) for _, qs in runs])
        missing = set(entry_mod.queries()) - seen
        assert not missing, f"queries with no sweep rung at all: {sorted(missing)}"

    def test_sweep_gate_is_red_on_worsened_artifact(self):
        """The sweep gate must actually FIRE (same synthetic-worsening
        probe as the ladder gate test)."""
        rungs = _committed_sweeps()
        runs = [load(p) for p in rungs]
        with open(SWEEP) as f:
            baseline = json.load(f)
        scaled = [
            n for n, b in baseline.items()
            if b["exponent"] is not None
            and b["label"].startswith(("sublinear", "linear"))
        ]
        assert scaled, baseline
        victim = scaled[0]
        sf_top = max(sf for sf, qs in runs if victim in qs)
        worsened = [
            (sf, {**qs, **({victim: qs[victim] * 8.0}
                           if sf == sf_top and victim in qs else {})})
            for sf, qs in runs
        ]
        _, rows = build_rows(worsened, floor=1.0)
        violations = gate(rows, baseline)
        assert any(victim in v and "exponent" in v for v in violations), violations

    def test_sweep_summary_matches_committed_rungs(self):
        rungs = _committed_sweeps()
        _, rows = build_rows([load(p) for p in rungs], floor=1.0)
        want = summarize(rows, 0.0)
        with open(SWEEP) as f:
            got = json.load(f)
        assert got == json.loads(json.dumps(want)), (
            "scaling/SWEEP.json is stale — regenerate with "
            "tools/scaling_report.py <sweep rungs> --write-summary "
            "scaling/SWEEP.json"
        )


SWEEP_LADDER = os.path.join(REPO, "scaling", "SWEEP_LADDER.json")


def _committed_ladder_sweeps() -> list[str]:
    """Newest committed full-fidelity TPC-H ladder rungs (r13 verdict
    task 1: the 9 ladder queries were the only registered queries with
    correctness but no measured scale exponent). Measured with
    ``SPARK_GRAFT_BENCH_REGISTRY=ladder`` on tools/gen_testdata.py
    full-schema fixtures."""
    return _newest_round_rungs("sweep_ladder_sf*_r*.json")


class TestLadderSweepGate:
    """The sweep-gate machinery applied to the full-fidelity TPC-H
    registry: the 9 ladder queries get gated exponents like every
    main-registry query."""

    def test_committed_ladder_sweep_within_accepted_summary(self):
        rungs = _committed_ladder_sweeps()
        assert len(rungs) >= 2, f"need >=2 ladder sweep rungs: {rungs}"
        _, rows = build_rows([load(p) for p in rungs], floor=1.0)
        with open(SWEEP_LADDER) as f:
            baseline = json.load(f)
        violations = gate(rows, baseline)
        assert not violations, "\n".join(violations)

    def test_ladder_sweep_covers_every_ladder_query(self):
        import __spark_entry__ as entry_mod

        runs = [load(p) for p in _committed_ladder_sweeps()]
        seen = set().union(*[set(qs) for _, qs in runs])
        missing = set(entry_mod.ladder_queries()) - seen
        assert not missing, f"ladder queries with no sweep rung: {sorted(missing)}"

    def test_ladder_sweep_gate_is_red_on_worsened_artifact(self):
        rungs = _committed_ladder_sweeps()
        runs = [load(p) for p in rungs]
        with open(SWEEP_LADDER) as f:
            baseline = json.load(f)
        scaled = [
            n for n, b in baseline.items()
            if b["exponent"] is not None
            and b["label"].startswith(("sublinear", "linear"))
        ]
        assert scaled, baseline
        victim = scaled[0]
        sf_top = max(sf for sf, qs in runs if victim in qs)
        worsened = [
            (sf, {**qs, **({victim: qs[victim] * 8.0}
                           if sf == sf_top and victim in qs else {})})
            for sf, qs in runs
        ]
        _, rows = build_rows(worsened, floor=1.0)
        violations = gate(rows, baseline)
        assert any(victim in v and "exponent" in v for v in violations), violations

    def test_ladder_sweep_summary_matches_committed_rungs(self):
        rungs = _committed_ladder_sweeps()
        _, rows = build_rows([load(p) for p in rungs], floor=1.0)
        want = summarize(rows, 0.0)
        with open(SWEEP_LADDER) as f:
            got = json.load(f)
        assert got == json.loads(json.dumps(want)), (
            "scaling/SWEEP_LADDER.json is stale — regenerate with "
            "tools/scaling_report.py <ladder rungs> --write-summary "
            "scaling/SWEEP_LADDER.json"
        )
