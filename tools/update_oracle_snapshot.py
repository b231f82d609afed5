"""Refresh ORACLE_SNAPSHOT.json — the per-query md5 of each oracle's text as
of its most recent external verification row (registry.py reads it to front
queries whose oracle was rewritten after their last row).

Run at ROUND START, before editing any oracle: queries rowed in the latest
CORRECTNESS_r{N}.json were verified against the oracle text currently in the
repo, so their snapshot entries refresh to the current hash. Entries for
queries not in the latest round keep their recorded hash (their rows attest
the OLD text; editing the oracle then re-fronts them automatically).

Usage::

    python tools/update_oracle_snapshot.py           # refresh latest-round rows
    python tools/update_oracle_snapshot.py --seed-all  # one-time bootstrap
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reconciliation_hive_data_spark import registry  # noqa: E402


def main() -> None:
    seed_all = "--seed-all" in sys.argv[1:]
    registry.load_all_modules()
    rounds = registry._verified_rounds()
    latest = max(rounds.values(), default=0)
    path = os.path.join(registry.repo_root(), registry._SNAPSHOT_FILE)
    snapshot = registry._oracle_snapshot()

    refreshed, pruned = [], []
    for name, spec in registry.REGISTRY.items():
        if spec.oracle is None:
            continue
        if seed_all or rounds.get(name) == latest:
            h = registry.oracle_hash(spec.oracle)
            if snapshot.get(name) != h:
                refreshed.append(name)
            snapshot[name] = h
    for name in sorted(snapshot):
        spec = registry.REGISTRY.get(name)
        if spec is None or spec.oracle is None:
            pruned.append(name)
            del snapshot[name]

    with open(path, "w") as fh:
        json.dump(dict(sorted(snapshot.items())), fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"{registry._SNAPSHOT_FILE}: {len(snapshot)} entries "
        f"(latest round r{latest}; refreshed {len(refreshed)}, "
        f"pruned {len(pruned)})"
    )
    if refreshed:
        print("refreshed:", ", ".join(sorted(refreshed)))


if __name__ == "__main__":
    main()
