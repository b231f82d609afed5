"""The cross-sf complexity audit (tools/scale_curve.py) is itself a CI
gate: the committed bench artifacts must show no superlinear query, and
the flag logic must actually catch one when it exists.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from scale_curve import FLAG_R2, audit, load_artifacts  # noqa: E402


def _synthetic(linear_t: float, quad_factor: float) -> dict:
    """One linear query and one whose time multiplies by quad_factor per
    10x data step (a quadratic term would give ~100x per step)."""
    return {
        0.001: {"lin": linear_t, "quad": 0.5},
        0.01: {"lin": linear_t * 2, "quad": 0.5 * quad_factor},
        0.1: {"lin": linear_t * 8, "quad": 0.5 * quad_factor * quad_factor},
    }


def test_audit_flags_superlinear_growth():
    rows, flagged = audit(_synthetic(1.0, 40.0))
    assert flagged == ["quad"]
    r2 = {q: r2 for r2, _, _, _, _, q, _ in rows}
    assert r2["quad"] > FLAG_R2
    assert r2["lin"] < FLAG_R2


def test_audit_flags_unmeasurable_ratios_instead_of_passing_them():
    """A zero/NaN median makes the growth ratio unmeasurable — that is a
    corrupt artifact and must FAIL the gate, not slide through via
    ``NaN > FLAG_R2 == False`` (r7 ADVICE item)."""
    data = {
        0.001: {"lin": 1.0, "corrupt": 0.5},
        0.01: {"lin": 2.0, "corrupt": 0.0},
        0.1: {"lin": 8.0, "corrupt": 1.0},
    }
    rows, flagged = audit(data)
    assert flagged == ["corrupt"]
    # the corrupt query never reaches the sorted rows, so no NaN scrambles
    # the r2-descending ordering
    assert [q for *_, q, _ in rows] == ["lin"]


def test_audit_noise_floor_suppresses_tiny_queries():
    # 0.01s -> 0.2s is a 20x ratio but still under the sf0.1 noise floor
    data = {0.001: {"tiny": 0.005}, 0.01: {"tiny": 0.01}, 0.1: {"tiny": 0.2}}
    _, flagged = audit(data)
    assert flagged == []


def test_committed_artifacts_have_no_superlinear_query():
    """The committed three-sf artifacts are the current empirical answer
    to 'does any query's work grow faster than its data' — this pins it
    to NO. If a plan change trips this, either fix the complexity or
    re-justify and refresh the artifacts consciously."""
    data = load_artifacts()
    assert data is not None, "bench artifacts missing at repo root"
    rows, flagged = audit(data)
    assert len(rows) >= 190
    assert not flagged, f"superlinear queries: {flagged}"


def test_committed_bench_artifacts_are_internally_consistent():
    """Each committed BENCH_FULL artifact must be self-consistent (value ==
    sum of per-query medians, no failed queries, full registry coverage)
    and cover the same query set as the others — a partial or mixed-boot
    refresh would silently skew the cross-sf ratios above."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sets = []
    for fname in (
        "BENCH_FULL.json",
        "BENCH_FULL_sf0.01.json",
        "BENCH_FULL_sf0.001.json",
    ):
        d = json.load(open(os.path.join(root, fname)))
        assert abs(d["value"] - sum(d["queries"].values())) < 0.01, fname
        assert d["failed"] == [], fname
        sets.append(set(d["queries"]))
    assert sets[0] == sets[1] == sets[2]

    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    assert sets[0] == set(registry.REGISTRY)
