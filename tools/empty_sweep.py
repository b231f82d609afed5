"""Registry-wide oracle-parity sweep on an ALL-EMPTY synthetic sf_dir.

Every fixture table is written as a zero-row parquet file with the real
fixture schema, then every registered query runs UNCHANGED through the
real load path and (when it has one) its DuckDB oracle replays on the
same dir — the harshest universal edge input: empty aggregations, empty
join sides, min/max over nothing, zero-file sinks.

Usage::

    python tools/empty_sweep.py [src_sf_dir]

Exits 0 when the outcome matches the KNOWN ledger below (PERF.md round
10), 1 on any NEW failure — so the sweep is a regression gate, not a
wishlist. The known divergences are documented engine/oracle semantics,
not operator bugs:

- agg_cube / agg_rollup / agg_gsets / agg_groupingid — Spark itself
  returns ZERO rows for GROUP BY CUBE/ROLLUP/GROUPING SETS on empty
  input, while DuckDB (and the SQL standard) emit the grand-total row.
  Upstream engine divergence; delegating to Spark's native Expand-based
  plan is the right 100 TB shape.
- recon_api_summary / recon_crossformat — the oracles' NULL-propagating
  status CASEs read 'DIFF' when both sides are empty; the Spark side's
  coalesced counts correctly say MATCH (empty == empty). Oracle nuance.
- scan_binaryfile — the oracle hardcodes the coalesce(1) → exactly-one-
  file assumption; an empty frame writes ZERO data files and the Spark
  side truthfully reports 0.
- scan_partition_pruned / sink_partitioned / sink_compact — reading back
  an empty partitioned/compacted layout fails Spark schema inference
  (AnalysisException). Robustness candidates for a future round
  (explicit schema on read-back).
- x_sim_brp_mllib — MLlib BucketedRandomProjectionLSH.fit raises on an
  empty dataset (upstream limitation; rows-only query).
"""

from __future__ import annotations

import os
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tests"))

#: queries whose empty-input outcome is a KNOWN, documented divergence
KNOWN_MISMATCH = {
    "agg_cube",
    "agg_rollup",
    "agg_gsets",
    "agg_groupingid",
    "recon_api_summary",
    "recon_crossformat",
    "scan_binaryfile",
}
KNOWN_ERROR = {
    "scan_partition_pruned",
    "sink_partitioned",
    "sink_compact",
    "x_sim_brp_mllib",
}


def main() -> int:
    import pyarrow.parquet as pq

    from parity import compare
    from reconciliation_hive_data_spark import registry
    from reconciliation_hive_data_spark.catalog import TABLES
    from reconciliation_hive_data_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    registry.load_all_modules()
    spark = get_spark("rhds-empty-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="rhds_empty_sweep_")
    for t in TABLES:
        sch = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(sch.empty_table(), f"{d}/{t}.parquet")

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

        known = (name in KNOWN_MISMATCH and outcome == "mismatch") or (
            name in KNOWN_ERROR and outcome == "error"
        )
        if outcome == "ok":
            n_ok += 1
            if name in KNOWN_MISMATCH | KNOWN_ERROR:
                healed.append(name)
        elif not known:
            new_bad.append(f"{name}: {outcome} {detail}")
            print(f"NEW {outcome.upper()} {name}: {detail}", flush=True)

    print(
        f"\nempty sweep: {n_ok} ok, "
        f"{len(KNOWN_MISMATCH | KNOWN_ERROR) - len(healed)} known divergences, "
        f"{len(new_bad)} NEW failures"
    )
    if healed:
        print(f"healed (remove from ledger): {healed}")
    spark.stop()
    return 1 if new_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
