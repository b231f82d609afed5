"""Unit tests for tools/bench_diff.py — the per-round regression gate.
Pins the three verdicts (regression / improvement / breakage) and the
noise floor, including the hole where a query failing in the NEW artifact
(median -1.0) must fail the gate rather than print as 'improved'."""

from __future__ import annotations

import json
import os
import subprocess
import sys

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "bench_diff.py",
)


def _run(tmp_path, old: dict, new: dict, *extra: str):
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps({"queries": old}))
    pn.write_text(json.dumps({"queries": new}))
    r = subprocess.run(
        [sys.executable, _TOOL, str(po), str(pn), *extra],
        capture_output=True,
        text=True,
    )
    return r.returncode, r.stdout


def test_regression_flagged_and_exit_1(tmp_path):
    rc, out = _run(tmp_path, {"q": 1.0}, {"q": 1.6})
    assert rc == 1 and "REGRESSION q" in out


def test_within_ratio_passes(tmp_path):
    rc, out = _run(tmp_path, {"q": 1.0}, {"q": 1.4})
    assert rc == 0 and "no regressions" in out


def test_floor_suppresses_tiny_query_noise(tmp_path):
    # 0.05 -> 0.2 is 4x but both under/near the 0.15 floor: 0.2 < 1.5*0.15
    rc, out = _run(tmp_path, {"q": 0.05}, {"q": 0.2})
    assert rc == 0


def test_new_failure_breaks_the_gate_not_improves(tmp_path):
    rc, out = _run(tmp_path, {"q": 1.0}, {"q": -1.0})
    assert rc == 1
    assert "BROKEN" in out and "improved" not in out


def test_old_failure_has_no_baseline(tmp_path):
    rc, out = _run(tmp_path, {"q": -1.0}, {"q": 5.0})
    assert rc == 0 and "REGRESSION" not in out


def test_persistent_failure_reported_but_not_gated(tmp_path):
    # failed in BOTH artifacts: not a regression between them, so the gate
    # must stay green (else it would be permanently red) — but the line is
    # still surfaced for the reader
    rc, out = _run(tmp_path, {"q": -1.0}, {"q": -1.0})
    assert rc == 0
    assert "still broken q" in out and "BROKEN     q" not in out


def test_totals_exclude_failure_sentinels(tmp_path):
    # -1.0 sentinels must not deflate the totals line
    rc, out = _run(tmp_path, {"q": 2.0, "r": -1.0}, {"q": 2.0, "r": -1.0})
    assert rc == 0
    assert "totals 2.0s -> 2.0s" in out


def test_improvement_reported(tmp_path):
    rc, out = _run(tmp_path, {"q": 2.0}, {"q": 1.0})
    assert rc == 0 and "improved   q" in out
