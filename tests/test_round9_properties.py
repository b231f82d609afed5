"""Round-9 property tests: x_attribution conservation/determinism and
scan_partition_pruned artifact behavior — the invariants the oracle hash
can't state directly (it proves equality with DuckDB, not that attribution
conserves sessions and value, or that the partitioned layout is reused
rather than rebuilt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reconciliation_hive_data_spark.plans.pipeline_ops import (
    win_sessionize,
    x_attribution,
)
from reconciliation_hive_data_spark.sources.files import scan_partition_pruned


def test_attribution_conserves_sessions(spark, sf_dir):
    """Every session is credited exactly once per touch type, so the
    first-touch and last-touch session totals must each equal the
    sessionizer's session count (same gap rule, same data)."""
    n_sessions = win_sessionize(spark, sf_dir).count()
    tot = (
        x_attribution(spark, sf_dir)
        .agg(
            F.sum("first_touch_sessions").alias("f"),
            F.sum("last_touch_sessions").alias("l"),
        )
        .first()
    )
    assert tot.f == n_sessions and tot.l == n_sessions


def test_attribution_conserves_value(spark, sf_dir):
    """Each touch type distributes the SAME total (the sum of all event
    values) across sources — attribution reassigns credit, never creates
    or destroys it. Sums are exact-decimal underneath; the final
    double-add across ≤5 sources tolerates only float formatting noise."""
    from reconciliation_hive_data_spark.catalog import load

    total = (
        load(spark, sf_dir, "events")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"))
        .first()
        .v
    )
    tot = (
        x_attribution(spark, sf_dir)
        .agg(
            F.sum("first_touch_value").alias("f"),
            F.sum("last_touch_value").alias("l"),
        )
        .first()
    )
    assert abs(tot.f - total) < 1e-6 and abs(tot.l - total) < 1e-6


def test_attribution_partition_invariant(spark, sf_dir):
    """Credit assignment depends only on the (ts, event_id) total order,
    never on physical layout: a repartitioned input must produce the
    bit-identical report (doubles included — the sums are exact decimal
    underneath, so no ordering effect may surface)."""
    from reconciliation_hive_data_spark.catalog import load
    from reconciliation_hive_data_spark.plans.pipeline_ops import attribution_report

    ev = load(spark, sf_dir, "events")
    base = sorted(map(tuple, attribution_report(ev).collect()))
    shuffled = sorted(map(tuple, attribution_report(ev.repartition(13)).collect()))
    assert base == shuffled


def test_scan_partition_pruned_artifact_is_reused(spark, sf_dir):
    """Second invocation must NOT rebuild the partitioned layout (the
    fingerprint matches) — the ingest-once contract the query's 100 TB
    story rests on."""
    from reconciliation_hive_data_spark.artifacts import ensure_artifact

    scan_partition_pruned(spark, sf_dir)  # builds or reuses

    calls: list[bool] = []
    real = ensure_artifact

    def spy(*a, **k):
        loc, rebuilt = real(*a, **k)
        calls.append(rebuilt)
        return loc, rebuilt

    import reconciliation_hive_data_spark.sources.files as files_mod

    orig = files_mod.ensure_artifact
    files_mod.ensure_artifact = spy
    try:
        scan_partition_pruned(spark, sf_dir)
    finally:
        files_mod.ensure_artifact = orig
    assert calls == [False]
