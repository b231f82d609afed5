"""Registry-wide oracle-parity sweep on degenerate synthetic sf_dirs.

Two universal edge inputs, every fixture table at the real schema:

- ``empty``  — zero-row parquet per table: empty aggregations, empty join
  sides, min/max over nothing, zero-file sinks.
- ``onerow`` — the first fixture row per table: size-1 windows, n=1
  variance/correlation denominators, zero-range quantization grids,
  joins that match nothing.

Every registered query runs UNCHANGED through the real load path and
(when it has one) its DuckDB oracle replays on the same dir.

Usage::

    python tools/empty_sweep.py [empty|onerow|all] [src_sf_dir]

Exits 0 when the outcome matches the KNOWN ledger below (PERF.md round
10), 1 on any NEW failure — so the sweep is a regression gate, not a
wishlist. The known divergences are documented engine/oracle semantics,
not operator bugs:

- agg_cube / agg_rollup / agg_gsets / agg_groupingid — Spark itself
  returns ZERO rows for GROUP BY CUBE/ROLLUP/GROUPING SETS on empty
  input, while DuckDB (and the SQL standard) emit the grand-total row.
  Upstream engine divergence; delegating to Spark's native Expand-based
  plan is the right 100 TB shape. (In onerow mode the same divergence
  surfaces for the two queries whose dim joins match nothing.)
- scan_binaryfile — the oracle hardcodes the coalesce(1) → exactly-one-
  file assumption; an empty frame writes ZERO data files and the Spark
  side truthfully reports 0.
Healed in round 10 itself (explicit read-back schema; probe-row empty
guard): scan_partition_pruned / sink_partitioned / sink_compact /
x_sim_brp_mllib. Healed in round 15 (§7.7.2 null-safe status): the
recon_api_summary / recon_crossformat empty==empty divergence — the
oracle's cells SUM now coalesces to 0 and both engines' fingerprint
status treat a both-sides-NULL metric as MATCH.
"""

from __future__ import annotations

import os
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tests"))

#: per-mode ledgers of KNOWN, documented divergences
KNOWN = {
    "empty": {
        "mismatch": {
            "agg_cube",
            "agg_rollup",
            "agg_gsets",
            "agg_groupingid",
            "scan_binaryfile",
        },
        "error": set(),
    },
    "onerow": {
        # the 1-row customer's nation/region dim joins match nothing →
        # the grouping-sets input is empty → same upstream divergence
        "mismatch": {"agg_groupingid", "agg_rollup"},
        "error": set(),
    },
}


def _sweep(spark, mode: str, src: str) -> int:
    import pyarrow.parquet as pq

    from parity import compare
    from reconciliation_hive_data_spark import registry
    from reconciliation_hive_data_spark.catalog import TABLES

    d = tempfile.mkdtemp(prefix=f"rhds_{mode}_sweep_")
    for t in TABLES:
        if mode == "empty":
            pq.write_table(
                pq.read_schema(f"{src}/{t}.parquet").empty_table(),
                f"{d}/{t}.parquet",
            )
        else:
            pq.write_table(
                pq.read_table(f"{src}/{t}.parquet").slice(0, 1),
                f"{d}/{t}.parquet",
            )

    known = KNOWN[mode]
    all_known = known["mismatch"] | known["error"]
    new_bad: list[str] = []
    healed: list[str] = []
    n_ok = 0
    for name in sorted(registry.REGISTRY):
        spec = registry.get(name)
        outcome = "ok"
        detail = ""
        try:
            if spec.oracle:
                probs = compare(spec.fn(spark, d), spec.oracle, d, name)
                if probs:
                    outcome, detail = "mismatch", str(probs)[:200]
            else:
                spec.fn(spark, d).count()
        except Exception as e:  # noqa: BLE001 — classify, don't die
            outcome, detail = "error", repr(e)[:200]

        expected = name in known["mismatch"] and outcome == "mismatch" or (
            name in known["error"] and outcome == "error"
        )
        if outcome == "ok":
            n_ok += 1
            if name in all_known:
                healed.append(name)
        elif not expected:
            new_bad.append(f"{name}: {outcome} {detail}")
            print(f"NEW {outcome.upper()} [{mode}] {name}: {detail}", flush=True)

    print(
        f"\n{mode} sweep: {n_ok} ok, "
        f"{len(all_known) - len(healed)} known divergences, "
        f"{len(new_bad)} NEW failures"
    )
    if healed:
        print(f"healed (remove from {mode} ledger): {healed}")
    return len(new_bad)


def main() -> int:
    from reconciliation_hive_data_spark import registry
    from reconciliation_hive_data_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    modes = ["empty", "onerow"] if mode == "all" else [mode]
    registry.load_all_modules()
    spark = get_spark("rhds-edge-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    bad = sum(_sweep(spark, m, src) for m in modes)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
