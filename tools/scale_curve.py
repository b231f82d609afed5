"""Empirical scale-sensitivity audit: compare per-query medians across the
three bench artifacts (sf0.001 / sf0.01 / sf0.1 — each a 10× data step) and
classify growth. Usage::

    python tools/scale_curve.py [--json]

For each query with all three points, computes r1 = t(0.01)/t(0.001) and
r2 = t(0.1)/t(0.01). At local fixture scales most queries are
overhead-dominated (r ≈ 1); linear compute shows r ≲ 10; r2 meaningfully
above 10 is the red flag — work growing faster than data (quadratic
candidate-pair terms, unbounded windows) that a 1000× scale-up would
amplify. The audit prints the r2-descending tail so every flagged query
can be matched against its documented blocking-key bound.

Artifacts must come from the same boot to be comparable (PERF.md documents
the 1.3-1.6× cross-boot swing); single-query ratios under ~0.3 s at the
larger sf are noise-dominated and marked accordingly.
"""

from __future__ import annotations

import json
import math
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACTS = {
    0.001: "BENCH_FULL_sf0.001.json",
    0.01: "BENCH_FULL_sf0.01.json",
    0.1: "BENCH_FULL.json",
}


#: r2 above this is a superlinear flag: time grew >10× on a 10× data step.
FLAG_R2 = 10.0
#: sub-this at sf0.1 is the local scheduling floor — ratios are noise.
NOISE_FLOOR_S = 0.3


def audit(
    data: dict[float, dict[str, float]],
) -> tuple[list[tuple], list[str]]:
    """Given {sf: {query: median_sec}} for the three sfs, return
    (rows sorted by r2 desc, flagged query names). rows are
    (r2, r1, t0.001, t0.01, t0.1, name, is_noise).

    A non-positive (or non-finite) median makes the ratio unmeasurable —
    that is a corrupt artifact, not a pass, so the query is flagged
    explicitly instead of letting ``NaN > FLAG_R2 == False`` slip it
    through the gate (and NaNs never reach the sort, whose ordering they
    would scramble)."""
    shared = sorted(set(data[0.001]) & set(data[0.01]) & set(data[0.1]))
    rows = []
    flagged = []
    for q in shared:
        t1, t2, t3 = data[0.001][q], data[0.01][q], data[0.1][q]
        if not all(math.isfinite(t) and t > 0 for t in (t1, t2, t3)):
            flagged.append(q)
            continue
        r1 = t2 / t1
        r2 = t3 / t2
        noise = t3 < NOISE_FLOOR_S
        rows.append((r2, r1, t1, t2, t3, q, noise))
    rows.sort(reverse=True)
    flagged += [q for r2, _, _, _, _, q, noise in rows if r2 > FLAG_R2 and not noise]
    return rows, flagged


def load_artifacts(root: str = _HERE) -> dict[float, dict[str, float]] | None:
    data: dict[float, dict[str, float]] = {}
    for sf, fname in ARTIFACTS.items():
        path = os.path.join(root, fname)
        if not os.path.exists(path):
            print(f"missing {fname} — run bench.py with SPARK_GRAFT_SF_DIR for sf{sf}")
            return None
        data[sf] = json.load(open(path))["queries"]
    return data


def main() -> int:
    data = load_artifacts()
    if data is None:
        return 1
    rows, flagged = audit(data)
    shared = [r[5] for r in rows]
    if "--json" in sys.argv:
        print(
            json.dumps(
                {
                    q: {"t_sf0.001": t1, "t_sf0.01": t2, "t_sf0.1": t3, "r1": round(r1, 2), "r2": round(r2, 2)}
                    for r2, r1, t1, t2, t3, q, _ in rows
                }
            )
        )
        return 0
    print(f"{len(shared)} queries; r1 = t(0.01)/t(0.001), r2 = t(0.1)/t(0.01) — data ×10 each step")
    print(f"{'query':30s} {'t.001':>7s} {'t.01':>7s} {'t.1':>7s} {'r1':>6s} {'r2':>6s}")
    for r2, r1, t1, t2, t3, q, noise in rows[:30]:
        tag = "  (noise floor)" if noise else ""
        print(f"{q:30s} {t1:7.2f} {t2:7.2f} {t3:7.2f} {r1:6.2f} {r2:6.2f}{tag}")
    print(f"\nsuperlinear flags (r2 > {FLAG_R2:g}, non-noise): {flagged or 'none'}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
