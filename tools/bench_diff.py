"""Per-query regression diff between two bench artifacts (BENCH_FULL.json
shape: {"queries": {name: median_sec, ...}}). The comparison the round
verdict runs: a query regresses when its new median exceeds ratio× the old
one, with both sides floored (sub-floor timings are scheduler noise, not
signal). Defaults match the verdict's gate: ratio 1.5, floor 0.15 s.

Usage::

    python tools/bench_diff.py OLD.json NEW.json [--ratio 1.5] [--floor 0.15]
    python tools/bench_diff.py <(git show r6:BENCH_FULL.json) BENCH_FULL.json

Exit status 1 when any regression is found (usable as a pre-commit gate).
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    q = d.get("queries", d)
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.15)
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    shared = sorted(set(old) & set(new))
    regs, imps, broke, still = [], [], [], []
    for name in shared:
        # bench.py records a failed query as -1.0.  Gate intent: this tool
        # detects REGRESSIONS between two artifacts, so only a NEWLY-failing
        # query (old >= 0, new < 0) is breakage that fails the gate.  A query
        # failed in BOTH artifacts is reported ("still broken") but does not
        # fail here — absolute failures are the correctness gate's job, and
        # a persistent failure must not make this gate permanently red.
        if new[name] < 0:
            (still if old[name] < 0 else broke).append(name)
            continue
        if old[name] < 0:
            continue
        o, n = max(old[name], args.floor), new[name]
        if n > args.ratio * o:
            regs.append((name, old[name], n))
        elif max(n, args.floor) * args.ratio < o:
            imps.append((name, old[name], n))

    # totals exclude -1.0 failure sentinels so they aren't understated by
    # 1 s per failed query
    tot_old = sum(v for v in old.values() if v >= 0)
    tot_new = sum(v for v in new.values() if v >= 0)
    print(
        f"{len(shared)} shared queries "
        f"(+{len(set(new) - set(old))} new, -{len(set(old) - set(new))} gone); "
        f"totals {tot_old:.1f}s -> {tot_new:.1f}s"
    )
    for name, o, n in sorted(regs, key=lambda t: t[2] / max(t[1], args.floor),
                             reverse=True):
        print(f"  REGRESSION {name}: {o:.2f}s -> {n:.2f}s ({n / max(o, args.floor):.2f}x)")
    for name, o, n in sorted(imps, key=lambda t: t[1] - t[2], reverse=True):
        print(f"  improved   {name}: {o:.2f}s -> {n:.2f}s")
    for name in broke:
        print(f"  BROKEN     {name}: failed in the new artifact (-1.0)")
    for name in still:
        print(f"  still broken {name}: failed in both artifacts (not gated here)")
    if not regs and not broke:
        print(f"no regressions >{args.ratio}x (floor {args.floor}s)")
    return 1 if regs or broke else 0


if __name__ == "__main__":
    sys.exit(main())
