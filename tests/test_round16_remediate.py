"""Round-16 recon_remediate pins (SURVEY §7.12.1).

The remediation tier turns recon_bucket_drill's fault list into the
write-ready action list a fix-up job executes. The pins cover the arms
the standard faulty fixture cannot reach and the election semantics the
vet note flagged:

- **delete arm** — the faulty fixture's target keys are a subset of the
  source's (orders_target only drops/dups/perturbs), so 'delete'
  (target-only garbage) never fires through the registered pair. Pinned
  at the :func:`remediation_plan` level with a synthetic pair and an
  independent Python expectation; payload columns must be NULL.
- **multi-copy election** — a source key with several DISTINCT payload
  copies must elect deterministically: min over the canonical row TEXT.
  Verified against the independently computed expected winner.
- **NULL-field ride** — DuckDB's scalar ``arg_min`` SKIPS NULL value
  arguments (probed r16), which per-column election would turn into a
  resurrected field from a LOSING copy. The struct election must keep the
  winning copy's NULL fields NULL.
- **canonical-unit tie invisibility** — two copies whose doubles differ
  below the DECIMAL(28,6) serialization tie on the election key; the
  emitted payload must be the shared canonical value regardless of which
  raw row either engine picks.
- **clean pair ⇒ zero rows**; **drill cross-check** — remediate's
  (bucket, key, action) set must map 1:1 onto recon_bucket_drill's
  (bucket, key, fault) set on the same pair.

Cross-engine coverage for the fixture-reachable arms rides the
_RECON_ALL_ORDERS family sweep (test_round10_properties) and the r16
soak pool (tools/soak_r16.py), whose orders zoo adds duplicate source
keys with distinct payloads — shapes the round-10 writer (unique keys)
never produces.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from reconciliation_hive_data_spark.plans.recon import orders_target
from reconciliation_hive_data_spark.plans.recon_scale import remediation_plan

from .test_round10_properties import _oracle_parity, _write_orders

_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
    " o_totalprice double, sec bigint, o_orderpriority string"
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.timestamp_seconds("sec").alias("o_orderdate"),
        "o_orderpriority",
    )


def test_delete_arm_lists_target_only_keys_with_null_payload(spark):
    src = _frame(spark, [(1, 1, "O", 100.0, 0, "1-URGENT")])
    tgt = _frame(
        spark,
        [
            (1, 1, "O", 100.0, 0, "1-URGENT"),  # clean
            (2, 2, "F", 200.0, 0, "5-LOW"),  # target-only → delete
            (3, 3, "P", None, 0, None),  # target-only, null fields
        ],
    )
    rows = {r.o_orderkey: r for r in remediation_plan(src, tgt).collect()}
    assert set(rows) == {2, 3}
    for k in (2, 3):
        r = rows[k]
        assert r.action == "delete"
        assert (r.src_copies, r.tgt_copies) == (0, 1)
        assert (
            r.p_custkey,
            r.p_orderstatus,
            r.p_totalprice,
            r.p_orderdate,
            r.p_orderpriority,
        ) == (None, None, None, None, None)


def test_clean_pair_yields_zero_rows(spark):
    rows = [
        (1, 1, "O", 100.0, 0, "1-URGENT"),
        (2, 2, None, None, 1, None),  # nulls on BOTH sides still match
    ]
    assert remediation_plan(_frame(spark, rows), _frame(spark, rows)).count() == 0


def test_multicopy_election_is_min_canonical_text(spark):
    # key 5: two DISTINCT source payloads; target has a third → drift.
    # Canonical text starts with the serialized key then custkey, so the
    # copy with the smaller custkey STRING wins ('1' < '2').
    src = _frame(
        spark,
        [
            (5, 2, "O", 100.0, 0, "1-URGENT"),
            (5, 1, "F", 200.0, 1, None),  # winner; NULL priority must ride
        ],
    )
    tgt = _frame(
        spark,
        [
            (5, 9, "P", 300.0, 2, "5-LOW"),
            (5, 9, "P", 300.0, 2, "5-LOW"),
        ],
    )
    out = remediation_plan(src, tgt).collect()
    assert len(out) == 1
    r = out[0]
    # same multiplicity (2 vs 2) with differing values → 'update'
    assert r.action == "update"
    assert (r.src_copies, r.tgt_copies) == (2, 2)
    assert r.p_custkey == 1
    assert r.p_orderstatus == "F"
    assert r.p_totalprice == 200.0
    # canonical second-precision date text of epoch+1s (UTC session)
    assert r.p_orderdate == "1970-01-01 00:00:01"
    # the NULL-field ride: the winning copy's NULL priority stays NULL
    # even though the losing copy carries '1-URGENT'
    assert r.p_orderpriority is None


def test_sub_micro_price_twins_emit_identical_canonical_payload(spark):
    # two copies whose prices differ below the DECIMAL(28,6) grain tie on
    # the election key; whichever raw row wins, the emitted payload is the
    # shared canonical value
    src = _frame(
        spark,
        [
            (7, 1, "O", 100.0000001, 0, "1-URGENT"),
            (7, 1, "O", 100.0000004, 0, "1-URGENT"),
        ],
    )
    tgt = _frame(spark, [(7, 1, "O", 999.0, 0, "1-URGENT")])
    out = remediation_plan(src, tgt).collect()
    assert len(out) == 1
    assert out[0].action == "set_copies"
    assert out[0].p_totalprice == 100.0


def test_remediate_actions_map_onto_drill_faults(spark, tmp_path):
    """On the registered faulty pair, remediate's (bucket, key) set must
    equal recon_bucket_drill's, with the action ↔ fault-class bijection
    (insert↔missing_in_target, delete↔missing_in_source,
    set_copies↔copy_count, update↔drift)."""
    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    d = str(tmp_path)
    _write_orders(
        spark,
        d,
        [
            (1007, 1, "O", 100.0, 0, "1-URGENT"),  # →insert (dropped in tgt)
            (2013, 2, "F", 250.5, 1, "3-MEDIUM"),  # →update (price drift)
            (3021, 3, "P", 300.0, 2, "5-LOW"),  # →set_copies (dup in tgt)
            (4000, 4, "O", 400.0, 3, None),  # clean
        ],
    )
    mapping = {
        "missing_in_target": "insert",
        "missing_in_source": "delete",
        "copy_count": "set_copies",
        "drift": "update",
    }
    drill = {
        (r.bucket, r.o_orderkey): r.fault
        for r in registry.get("recon_bucket_drill").fn(spark, d).collect()
    }
    rem = {
        (r.bucket, r.o_orderkey): r.action
        for r in registry.get("recon_remediate").fn(spark, d).collect()
    }
    assert rem == {k: mapping[v] for k, v in drill.items()}
    assert set(rem.values()) == {"insert", "update", "set_copies"}
    # and the oracle agrees on the same synthetic table
    _oracle_parity(spark, d, ("recon_remediate",))


def test_insert_rows_carry_source_payload(spark, sf_dir):
    """Fixture smoke at the test sf: every non-delete action row carries a
    fully materialized payload (insert/update/set_copies fetch succeeded),
    and payloads reproduce the SOURCE values for the drifted keys — the
    fix-up list rewrites target with source truth, pre-perturbation."""
    from reconciliation_hive_data_spark.catalog import load

    src = load(spark, sf_dir, "orders")
    out = remediation_plan(src, orders_target(src))
    bad = out.filter(
        (F.col("action") != "delete") & F.col("p_custkey").isNull()
    )
    assert bad.count() == 0
    # drifted keys (%1000 == 13): the payload price must be the SOURCE
    # price (target carries +1.0)
    drift = out.filter(F.col("o_orderkey") % 1000 == 13).limit(1).collect()
    if drift:
        k = drift[0].o_orderkey
        src_price = (
            src.filter(F.col("o_orderkey") == k)
            .select(
                (F.col("o_totalprice").cast("double") + F.lit(0.0))
                .cast("decimal(28,6)")
                .cast("double")
                .alias("p")
            )
            .collect()[0]
            .p
        )
        assert drift[0].p_totalprice == src_price


# ---------------------------------------------------------------------------
# standing property fuzz: duplicate-key corpora the round-10 writer can't
# produce (its orders strategy is unique_by key) — multi-copy elections,
# exact duplicates, and fault residues mixed freely; oracle parity plus the
# drill bijection re-asserted per draw
# ---------------------------------------------------------------------------

_DUP_ORDERS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # key base (dups ALLOWED)
        st.sampled_from([0, 7, 13, 21, 34]),  # fault residue
        st.integers(min_value=1, max_value=9),  # cust
        st.sampled_from(["O", "F", "P"]),
        st.one_of(
            st.none(),
            st.integers(min_value=0, max_value=1_000_000).map(
                lambda c: c / 100.0
            ),
        ),
        st.integers(min_value=0, max_value=30),  # day
        st.one_of(st.none(), st.sampled_from(["1-URGENT", "5-LOW"])),
    ),
    min_size=1,
    max_size=16,
)


@pytest.mark.soak
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(orders=_DUP_ORDERS)
def test_remediate_matches_oracle_on_dup_key_corpora(spark, orders):
    """Random multi-copy corpora: duplicate keys with distinct or identical
    payloads across every fault residue. Asserts (a) full oracle parity,
    (b) the drill bijection holds on every draw (the independent-
    expectation pin that catches symmetric semantic inversions — SURVEY
    §7.12 lesson), (c) every non-delete row carries a payload."""
    import shutil
    import tempfile

    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    rows = [
        (base * 1000 + res, c, s, p, day, prio)
        for base, res, c, s, p, day, prio in orders
    ]
    d = tempfile.mkdtemp(prefix="rhds_remediate_fuzz_")
    try:
        _write_orders(spark, d, rows)
        _oracle_parity(spark, d, ("recon_remediate",))
        mapping = {
            "missing_in_target": "insert",
            "missing_in_source": "delete",
            "copy_count": "set_copies",
            "drift": "update",
        }
        drill = {
            (r.bucket, r.o_orderkey): r.fault
            for r in registry.get("recon_bucket_drill").fn(spark, d).collect()
        }
        rem = {}
        for r in registry.get("recon_remediate").fn(spark, d).collect():
            rem[(r.bucket, r.o_orderkey)] = r.action
            if r.action != "delete":
                assert r.p_custkey is not None, r
        assert rem == {k: mapping[v] for k, v in drill.items()}
    finally:
        shutil.rmtree(d, ignore_errors=True)
