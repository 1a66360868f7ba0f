"""Pin the RAISE-fence rung artifact (r12 verdict task 3).

tools/fence_rung.py drives the three RAISE-class fences to their
binding point on rung fixtures through the PUBLIC functions and writes
CORRECTNESS_FENCE_r*.json. This test keeps the committed artifact and
the tool's contract from drifting apart: every required fence must be
present, FIRED with its named ValueError, and carry a PASSING
smaller-rung control (the non-vacuity half — a fence that fires
everywhere proves nothing about the rung).
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

EXPECTED_NEEDLES = {
    "fuzzy_pair_budget": "candidate-pair budget exceeded",
    "pq_query_fence": "exceeds max_queries",
    "simhash_collapse": "LSH band cap collapse",
}


def _latest_artifact() -> Path:
    arts = sorted(REPO.glob("CORRECTNESS_FENCE_r*.json"))
    assert arts, (
        "no CORRECTNESS_FENCE_r*.json committed — run "
        "python tools/fence_rung.py --json CORRECTNESS_FENCE_r<N>.json"
    )
    return arts[-1]


def test_required_fences_match_tool():
    from tools.fence_rung import REQUIRED_FENCES

    assert set(REQUIRED_FENCES) == set(EXPECTED_NEEDLES)


def test_artifact_shows_every_fence_fired_with_control():
    with open(_latest_artifact()) as f:
        report = json.load(f)
    assert report["ok"] is True
    fences = report["fences"]
    for name, needle in EXPECTED_NEEDLES.items():
        entry = fences[name]
        assert entry["fired"] is True, name
        assert entry["error"] == "ValueError", name
        assert needle in entry["message_head"], name
        assert entry["control"]["passed"] is True, (
            f"{name}: control rung must PASS — a fence that also fires "
            "at the small rung is not evidence it binds at scale"
        )
        # controls that pass must have actually produced a frame
        assert entry["control"].get("rows") is not None, name
