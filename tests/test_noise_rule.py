"""Pin tools/noise_rule.py — the machine form of the bench noise rule
(r11 verdict task 1: "the noise rule needs to be a tool, not a judgment
call").  Synthetic worsened artifacts exercise every verdict branch."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.noise_rule import evaluate  # noqa: E402

# several ~1.0-ratio anchor queries keep the synthetic run's MEDIAN
# ratio near 1.0, so the per-query branches are tested independently of
# the r12 uniform-shift tier (which has its own tests below)
_ANCHORS = {f"q_anchor{i}": 1.0 for i in range(6)}

BASELINE = {
    "queries": {
        **_ANCHORS,
        "q_fast": 1.0,
        "q_noisy": 1.0,
        "q_regressed": 1.0,
        "q_small_delta": 0.1,
    }
}


def _current(regime: str) -> dict:
    return {
        "regime": regime,
        "calib_s": [0.31, 0.33] if regime == "ok" else [0.9, 1.1],
        "calib_bound_s": 0.5,
        "queries": {
            **{k: 1.01 for k in _ANCHORS},
            # not crossed: ratio 1.2 <= 1.3
            "q_fast": 1.2,
            # ratio 1.6 > 1.3 BUT delta 0.6 <= own spread 0.7 -> noise
            "q_noisy": 1.6,
            # ratio 2.0 AND delta 1.0 > spread 0.2 -> crossed
            "q_regressed": 2.0,
            # ratio 2.0 but delta 0.1 <= spread 0.15 -> noise
            "q_small_delta": 0.2,
            # present only in current
            "q_new": 0.5,
        },
        "spread": {
            "q_fast": 0.05,
            "q_noisy": 0.7,
            "q_regressed": 0.2,
            "q_small_delta": 0.15,
        },
    }


class TestNoiseRule:
    def test_clean_regime_crossing_is_regression(self):
        rep = evaluate(_current("ok"), BASELINE)
        v = rep["verdicts"]
        assert v["q_fast"]["verdict"] == "ok"
        assert v["q_noisy"]["verdict"] == "ok"  # delta within own spread
        assert v["q_small_delta"]["verdict"] == "ok"
        assert v["q_regressed"]["verdict"] == "crossed"
        assert v["q_new"]["verdict"] == "no-baseline"
        assert rep["overall"] == "regressed"
        assert rep["crossed"] == ["q_regressed"]

    def test_failed_query_means_broken(self):
        cur = _current("ok")
        cur["queries"]["q_fast"] = -1.0
        rep = evaluate(cur, BASELINE)
        assert rep["verdicts"]["q_fast"]["verdict"] == "failed"
        assert rep["overall"] == "broken"
        assert rep["failed"] == ["q_fast"]

    def test_vanished_baseline_query_means_broken(self):
        cur = _current("ok")
        del cur["queries"]["q_noisy"]
        # keep the run otherwise clean so 'broken' is attributable
        cur["queries"]["q_regressed"] = 1.0
        rep = evaluate(cur, BASELINE)
        assert rep["verdicts"]["q_noisy"]["verdict"] == "missing-from-current"
        assert rep["overall"] == "broken"
        assert rep["missing_from_current"] == ["q_noisy"]

    def test_all_failed_run_never_adjudicates_ok(self):
        # the code-review scenario: every query crashed -> must not be
        # green (was overall='ok' before the r12 'broken' tier)
        cur = {"regime": "ok", "queries": {k: -1.0 for k in BASELINE["queries"]}}
        rep = evaluate(cur, BASELINE)
        assert rep["overall"] == "broken"


class TestUniformShiftTier:
    """r12: the host's bimodal ~15-20% slow mode inflates EVERY query
    and is invisible to the CPU-only probe; a code regression is never
    uniform. The median-ratio tier downgrades absolute crossings in a
    uniformly slow run, keeps relative standouts as hard crossings, and
    never lets a uniformly slow run read plain ok."""

    def _uniform(self, extra=None):
        qs = {k: v * 1.2 for k, v in BASELINE["queries"].items()}
        if extra:
            qs.update(extra)
        return {"regime": "ok", "queries": qs, "spread": {}}

    def test_uniform_slow_run_is_rerun_degraded_not_ok(self):
        rep = evaluate(self._uniform(), BASELINE)
        assert rep["uniform_slow"] is True
        assert rep["median_ratio"] > 1.15
        # q_fast etc. at ratio 1.2 don't cross; but the run still must
        # not read plain ok
        assert rep["overall"] == "rerun-degraded"

    def test_absolute_crossing_downgraded_in_uniform_slow_run(self):
        # ratio 1.5 crosses absolutely but rel = 1.5/1.2 = 1.25 < 1.3
        rep = evaluate(self._uniform({"q_noisy": 1.5}), BASELINE)
        assert rep["verdicts"]["q_noisy"]["verdict"] == "crossed-degraded"
        assert rep["overall"] == "rerun-degraded"

    def test_relative_standout_stays_crossed_in_uniform_slow_run(self):
        # ratio 2.4, rel = 2.4/1.2 = 2.0 > 1.3 -> localized regression
        rep = evaluate(self._uniform({"q_regressed": 2.4}), BASELINE)
        assert rep["verdicts"]["q_regressed"]["verdict"] == "crossed"
        assert rep["overall"] == "regressed"

    def test_overrides_replace_stale_baseline_entries(self):
        # baseline says 1.0 but the adjudicated value is 2.0: a current
        # reading of 2.2 is then ratio 1.1 -> ok
        cur = {
            "regime": "ok",
            "queries": {**{k: 1.0 for k in _ANCHORS}, "q_fast": 2.2},
        }
        base = {"queries": {**_ANCHORS, "q_fast": 1.0}}
        hot = evaluate(cur, base)
        assert hot["verdicts"]["q_fast"]["verdict"] == "crossed"
        cool = evaluate(
            cur, base, overrides={"q_fast": {"value": 2.0, "reason": "x"}}
        )
        assert cool["verdicts"]["q_fast"]["verdict"] == "ok"
        assert cool["applied_overrides"] == {"q_fast": 2.0}
        assert cool["overall"] == "ok"

    def test_degraded_regime_downgrades_crossings(self):
        rep = evaluate(_current("degraded"), BASELINE)
        assert rep["verdicts"]["q_regressed"]["verdict"] == "crossed-degraded"
        assert rep["overall"] == "rerun-degraded"
        assert rep["crossed"] == []
        assert rep["crossed_degraded"] == ["q_regressed"]

    def test_unknown_regime_treated_as_clean(self):
        cur = _current("ok")
        del cur["regime"]
        rep = evaluate(cur, BASELINE)
        assert rep["regime"] == "unknown"
        assert rep["verdicts"]["q_regressed"]["verdict"] == "crossed"

    def test_missing_spread_is_strictest(self):
        # short driver line: no spread dict -> spread 0, so ratio>1.3
        # with any positive delta crosses
        cur = {"regime": "ok", "queries": {"q_noisy": 1.6}}
        rep = evaluate(cur, BASELINE)
        assert rep["verdicts"]["q_noisy"]["verdict"] == "crossed"

    def test_all_ok(self):
        cur = {
            "regime": "ok",
            "queries": {k: v * 1.05 for k, v in BASELINE["queries"].items()},
        }
        rep = evaluate(cur, BASELINE)
        assert rep["overall"] == "ok"

    def test_cli_roundtrip(self, tmp_path):
        cur_p = tmp_path / "cur.json"
        base_p = tmp_path / "base.json"
        out_p = tmp_path / "out.json"
        cur_p.write_text(json.dumps(_current("degraded")))
        base_p.write_text(json.dumps(BASELINE))
        repo = Path(__file__).resolve().parents[1]
        proc = subprocess.run(
            [
                sys.executable,
                str(repo / "tools" / "noise_rule.py"),
                str(cur_p),
                str(base_p),
                "--json",
                str(out_p),
            ],
            capture_output=True,
            text=True,
        )
        # rerun-degraded exits 0 (not evidence of a regression)
        assert proc.returncode == 0, proc.stderr
        rep = json.loads(out_p.read_text())
        assert rep["overall"] == "rerun-degraded"

    def test_cli_exit_1_on_clean_regression(self, tmp_path):
        cur_p = tmp_path / "cur.json"
        base_p = tmp_path / "base.json"
        cur_p.write_text(json.dumps(_current("ok")))
        base_p.write_text(json.dumps(BASELINE))
        repo = Path(__file__).resolve().parents[1]
        proc = subprocess.run(
            [
                sys.executable,
                str(repo / "tools" / "noise_rule.py"),
                str(cur_p),
                str(base_p),
            ],
            capture_output=True,
            text=True,
        )
        assert proc.returncode == 1


def test_committed_bench_line_fits_driver_tail_budget():
    """The stdout line bench.py prints is the full payload MINUS spread
    (bench.py moves spreads to the sidecar). It must stay under ~1.9 KB:
    the driver archives a ~2 KB tail of stdout and a longer line loses
    its head, making the JSON unparseable (BENCH_r11.json parsed:null).
    bench.py self-slims past 1900 B, but slimming drops the per-query
    dict from the driver artifact — this test fails FIRST, at commit
    time, when headline growth approaches the budget."""
    import json

    repo = Path(__file__).resolve().parents[1]
    with open(repo / "scaling" / "bench_latest.json") as f:
        payload = json.load(f)
    line = json.dumps({k: v for k, v in payload.items() if k != "spread"})
    assert len(line) <= 1900, (
        f"printed bench line would be {len(line)}B (> 1900): trim the "
        "HEADLINE list or move more fields to the sidecar"
    )


class TestR13AdviceFixes:
    """r12 ADVICE: the relative tier must not fire on uniformly FAST
    runs, and a slim '_see' driver line must error at the sidecar path
    instead of adjudicating every query missing."""

    def test_uniform_fast_run_does_not_inflate_rel_ratio(self):
        # median 0.8 (uniformly fast); one query at absolute ratio 1.25
        # never crossed the documented rule — dividing by the sub-1
        # median would read rel 1.56 and flag it
        base = {"queries": {**{f"a{i}": 1.0 for i in range(6)}, "q_x": 1.0}}
        cur = {
            "regime": "ok",
            "queries": {**{f"a{i}": 0.8 for i in range(6)}, "q_x": 1.25},
            "spread": {"q_x": 0.01},
        }
        report = evaluate(cur, base)
        assert report["median_ratio"] < 1.0
        assert report["verdicts"]["q_x"]["verdict"] == "ok"
        assert report["overall"] == "ok"

    def test_rel_tier_still_fires_in_uniform_slow_run(self):
        # the normalisation floor must not weaken the standout rule:
        # median 1.15 (uniform slow), one query at 1.6 — rel 1.39 > 1.3
        base = {"queries": {**{f"a{i}": 1.0 for i in range(6)}, "q_x": 1.0}}
        cur = {
            "regime": "ok",
            "queries": {**{f"a{i}": 1.15 for i in range(6)}, "q_x": 1.6},
            "spread": {"q_x": 0.01},
        }
        report = evaluate(cur, base)
        assert report["uniform_slow"]
        assert report["verdicts"]["q_x"]["verdict"] == "crossed"

    def test_slim_see_line_refused_with_sidecar_path(self):
        import pytest

        cur = {"regime": "ok", "queries": {"_see": "scaling/bench_last_run_full.json"}}
        with pytest.raises(ValueError, match="bench_last_run_full"):
            evaluate(cur, BASELINE)

    def test_cli_slim_line_exits_2(self, tmp_path):
        cur = tmp_path / "cur.json"
        base = tmp_path / "base.json"
        cur.write_text(json.dumps({"queries": {"_see": "scaling/x.json"}}))
        base.write_text(json.dumps(BASELINE))
        proc = subprocess.run(
            [sys.executable, "tools/noise_rule.py", str(cur), str(base)],
            capture_output=True,
            text=True,
            cwd=str(Path(__file__).resolve().parents[1]),
        )
        assert proc.returncode == 2
        assert "sidecar" in proc.stderr


def test_committed_bench_latest_carries_clean_regime():
    """r13 bench policy (BASELINE.md): the driver-comparable artifact
    scaling/bench_latest.json must carry regime "ok" from BOTH probes —
    bench.py refuses to overwrite it from a degraded run, so a committed
    degraded artifact means the guard was bypassed."""
    import bench

    p = Path(__file__).resolve().parents[1] / "scaling" / "bench_latest.json"
    with open(p) as f:
        d = json.load(f)
    assert d["regime"] == "ok"
    assert max(d["calib_s"]) <= bench.CALIB_IDLE_BOUND_S
    assert "io_calib_s" in d, "bench_latest predates the IO probe — re-run bench.py"
    assert max(d["io_calib_s"]) <= bench.IO_CALIB_IDLE_BOUND_S
    assert d["io_calib_bound_s"] == bench.IO_CALIB_IDLE_BOUND_S


class TestRegimeShiftVerdict:
    """r15 (r14 verdict item 5): the fixed ceiling missed a 1.28x-slow
    window (calib 0.551/0.574 under the 0.75 bound); every run now also
    self-reports its probes against the committed clean r13 reference."""

    def test_clean_reference_window_is_not_shifted(self):
        import bench

        v = bench.regime_shift_verdict((0.442, 0.422), (0.573, 0.509))
        assert v["calib_shift"] == [1.0, 1.0]
        assert v["regime_shifted"] is False

    def test_r14_driver_window_is_flagged_shifted(self):
        # the exact probe values of the r14 driver artifact, which the
        # old ceiling-only rule tagged "ok"
        import bench

        v = bench.regime_shift_verdict((0.551, 0.574), (0.706, 0.567))
        assert v["calib_shift"][0] > bench.CALIB_SHIFT_FACTOR
        assert v["regime_shifted"] is True

    def test_uses_best_probe_so_one_spike_does_not_flag(self):
        # post-loop CPU spike, pre-loop clean: min() keeps the run clean
        import bench

        v = bench.regime_shift_verdict((0.43, 1.9), (0.52, 0.55))
        assert v["regime_shifted"] is False

    def test_io_only_shift_flags(self):
        import bench

        v = bench.regime_shift_verdict((0.43, 0.43), (0.75, 0.80))
        assert v["calib_shift"][1] > bench.CALIB_SHIFT_FACTOR
        assert v["regime_shifted"] is True
