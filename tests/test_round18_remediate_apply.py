"""Round-18 recon_remediate_apply pins (SURVEY §7.13 candidate 1).

The convergence tier completing detect → plan → apply → verify: APPLY
recon_remediate's action list to the target and RE-RUN the digest recon,
reporting per-action applied counts plus the residual convergence state.

Per the standing r16/r17 discipline, the independent expectation comes
FIRST: :func:`_replica` recomputes the whole report in pure Python —
canonical serialization, fault detection as multiset comparison, the
min-text election, and the single-payload convergence rule — entirely
outside both engines, so a semantic written identically into the Spark
plan and the DuckDB oracle still gets caught (the r16 action-inversion /
r17 injectivity lessons; oracle parity alone is structurally blind to
that class).

Pinned hazards from the §7.13 vet note:

- **sequence-descend guard** — Spark's ``sequence(1, 0)`` DESCENDS
  (returns [1, 0]) instead of dropping the row like DuckDB's ``range``;
  the apply explode must filter ``src_copies >= 1`` first. The probe is
  kept as a test so the guard can never be "simplified" away silently.
- **residual model** — a faulted non-delete key converges iff its source
  copies all share ONE canonical text (the single-payload write-list
  model); keys with >1 distinct source payload stay residual after apply
  and must be reported, not silently converged.
- **delete arm** — target-only keys are removed with nothing re-inserted
  and always converge (both sides end empty for the key).
- **NULL-key rows are invisible** — they never reach the drill on either
  engine (NULL md5 bucket), so apply must KEEP them untouched.
- **idempotent re-materialization** — the payload is serialized in
  canonical units; parsing it back (text timestamp → timestamp, decimal-6
  double) must hash identically to the source row for money-class values,
  or every 'update' would false-residual.
"""

from __future__ import annotations

import pytest
import hashlib
import shutil
import tempfile
from collections import Counter, defaultdict
from datetime import datetime, timezone
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from reconciliation_hive_data_spark.plans.recon import orders_target
from reconciliation_hive_data_spark.plans.recon_scale import (
    _BH_BUCKETS,
    remediation_apply_frames,
    remediation_apply_report,
)

from .test_round10_properties import _oracle_parity, _write_orders

_SEP = "␟"
_NULL = "␀"

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


# ---------------------------------------------------------------------------
# pure-Python replica — the independent expectation, no Spark, no DuckDB
# ---------------------------------------------------------------------------


def _canon_text(row) -> str:
    """Python twin of canonical_row_text(_ORDER_HASH_COLS) for test rows of
    shape (key, cust, status, price, epoch_sec, prio). Prices must be
    money-class (exact <= 6dp decimals) — the repo-wide convention."""
    k, c, s, p, sec, prio = row
    parts = [
        _NULL if k is None else str(k),
        _NULL if c is None else str(c),
        _NULL if s is None else s,
        _NULL
        if p is None
        else str(Decimal(str(p)).quantize(Decimal("0.000001"))),
        _NULL
        if sec is None
        else datetime.fromtimestamp(sec, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S"
        ),
        _NULL if prio is None else prio,
    ]
    return _SEP.join(parts)


def _bucket(k) -> int:
    return int(hashlib.md5(str(k).encode()).hexdigest()[:4], 16) % _BH_BUCKETS


def _replica(src_rows, tgt_rows) -> dict[str, tuple[int, int, int, int, int]]:
    """Expected report: {action: (n_keys, rows_removed, rows_inserted,
    n_residual_keys, n_residual_buckets)}. NULL-key rows are skipped on
    both sides (invisible to the drill by design)."""
    stx: dict = defaultdict(Counter)
    ttx: dict = defaultdict(Counter)
    for r in src_rows:
        if r[0] is not None:
            stx[r[0]][_canon_text(r)] += 1
    for r in tgt_rows:
        if r[0] is not None:
            ttx[r[0]][_canon_text(r)] += 1
    agg: dict = defaultdict(lambda: [0, 0, 0, 0, set()])
    for k in set(stx) | set(ttx):
        if stx.get(k) == ttx.get(k):
            continue  # clean key
        s_c = sum(stx[k].values()) if k in stx else None
        t_c = sum(ttx[k].values()) if k in ttx else None
        if s_c is None:
            action = "delete"
        elif t_c is None:
            action = "insert"
        elif s_c != t_c:
            action = "set_copies"
        else:
            action = "update"
        a = agg[action]
        a[0] += 1
        a[1] += t_c or 0
        a[2] += s_c if action != "delete" else 0
        if action != "delete" and len(stx[k]) > 1:
            a[3] += 1
            a[4].add(_bucket(k))
    return {
        action: (n, rm, ins, res, len(bks))
        for action, (n, rm, ins, res, bks) in agg.items()
    }


def _report(df) -> dict:
    return {
        r.action: (
            r.n_keys,
            r.rows_removed,
            r.rows_inserted,
            r.n_residual_keys,
            r.n_residual_buckets,
        )
        for r in df.collect()
    }


# ---------------------------------------------------------------------------
# pins
# ---------------------------------------------------------------------------


def test_sequence_descend_probe(spark):
    """WHY the apply explode guards src_copies >= 1: Spark's sequence(1, 0)
    descends to [1, 0] (two rows after explode) instead of producing an
    empty array like DuckDB's range(1, 1). If this probe ever fails, the
    guard can be revisited; until then it is load-bearing."""
    (row,) = spark.range(1).select(
        F.sequence(F.lit(1), F.lit(0)).alias("s")
    ).collect()
    assert row.s == [1, 0]


def test_registered_fixture_converges(spark, sf_dir):
    """The registered pair (unique source keys): every fault class the
    fixture injects appears, every action fully converges (single-payload
    sources), and the counts match the replica computed from the raw
    parquet rows."""
    from reconciliation_hive_data_spark.catalog import load

    src = load(spark, sf_dir, "orders")
    raw = [
        (
            r.o_orderkey,
            r.o_custkey,
            r.o_orderstatus,
            r.o_totalprice,
            int(r.o_orderdate.replace(tzinfo=timezone.utc).timestamp()),
            r.o_orderpriority,
        )
        for r in src.select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            (F.col("o_totalprice").cast("double") + F.lit(0.0))
            .cast("decimal(28,6)")
            .cast("double")
            .alias("o_totalprice"),
            F.date_trunc("second", "o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        ).collect()
    ]
    tgt_rows = [r for r in raw if r[0] % 1000 != 7]
    tgt_rows = [
        (
            k,
            c,
            s,
            (p + 1.0) if k % 1000 == 13 else p,
            sec,
            None if k % 1000 == 34 else prio,
        )
        for k, c, s, p, sec, prio in tgt_rows
    ]
    tgt_rows += [r for r in tgt_rows if r[0] % 1000 == 21]
    expected = _replica(raw, tgt_rows)
    got = _report(remediation_apply_report(src, orders_target(src)))
    assert got == expected
    assert all(v[3] == 0 and v[4] == 0 for v in got.values())


def test_delete_arm_and_null_key_rows_kept(spark):
    """Target-only keys → delete (removed, nothing inserted, converged);
    NULL-key rows on either side are invisible to the plan and survive the
    apply untouched."""
    src_rows = [
        (1, 1, "O", 100.0, 0, "1-URGENT"),
        (None, 9, "X", 1.0, 0, None),  # NULL key: invisible
    ]
    tgt_rows = [
        (1, 1, "O", 100.0, 0, "1-URGENT"),  # clean
        (2, 2, "F", 200.0, 0, "5-LOW"),  # target-only → delete
        (2, 2, "F", 201.0, 0, "5-LOW"),  # second copy, distinct payload
        (None, 8, "Y", 2.0, 0, None),  # NULL key: must be KEPT
    ]
    src, tgt = _frame(spark, src_rows), _frame(spark, tgt_rows)
    got = _report(remediation_apply_report(src, tgt))
    assert got == _replica(src_rows, tgt_rows)
    assert got == {"delete": (1, 2, 0, 0, 0)}
    # the applied target keeps the NULL-key row and drops exactly key 2
    _, tgt_after = remediation_apply_frames(src, tgt)
    after = tgt_after.collect()
    assert len(after) == 2
    assert {r.o_custkey for r in after} == {1, 8}


def test_multicopy_residual_is_reported(spark):
    """A faulted key whose SOURCE holds two distinct payloads cannot
    converge under the single-payload write list: apply inserts s_c copies
    of the elected payload, the hash re-verify still differs, and the
    report says so. A sibling key with two IDENTICAL source copies
    converges."""
    src_rows = [
        (5, 1, "F", 200.0, 1, None),  # elected (min text: cust '1')
        (5, 2, "O", 100.0, 0, "1-URGENT"),  # distinct second copy
        (6, 3, "O", 300.0, 2, "5-LOW"),
        (6, 3, "O", 300.0, 2, "5-LOW"),  # identical copies → converges
    ]
    tgt_rows = [
        (5, 9, "P", 999.0, 3, "5-LOW"),
        (5, 9, "P", 999.0, 3, "5-LOW"),  # update arm (2 vs 2, drift)
        (6, 3, "O", 300.0, 2, "5-LOW"),  # set_copies arm (2 vs 1)
    ]
    src, tgt = _frame(spark, src_rows), _frame(spark, tgt_rows)
    got = _report(remediation_apply_report(src, tgt))
    assert got == _replica(src_rows, tgt_rows)
    assert got == {
        "update": (1, 2, 2, 1, 1),
        "set_copies": (1, 1, 2, 0, 0),
    }


def test_update_rematerialization_is_hash_idempotent(spark):
    """The 'update' arm re-inserts the CANONICAL-unit payload (decimal-6
    double, second-precision date text parsed back). For money-class
    values that projection must hash identically to the source row —
    otherwise every update would report a false residual."""
    src_rows = [(13, 7, "O", 123.45, 86_399, "3-MEDIUM")]
    tgt_rows = [(13, 7, "O", 124.45, 86_399, "3-MEDIUM")]
    got = _report(
        remediation_apply_report(
            _frame(spark, src_rows), _frame(spark, tgt_rows)
        )
    )
    assert got == {"update": (1, 1, 1, 0, 0)}


def test_clean_pair_yields_zero_rows(spark):
    rows = [
        (1, 1, "O", 100.0, 0, "1-URGENT"),
        (2, 2, None, None, 1, None),
    ]
    df = remediation_apply_report(_frame(spark, rows), _frame(spark, rows))
    assert df.count() == 0


def test_oracle_parity_on_synthetic_pair(spark, tmp_path):
    """Driver-exact check on a synthetic table covering insert, update,
    set_copies, AND a multi-copy residual source key, plus the replica."""
    d = str(tmp_path)
    rows = [
        (1007, 1, "O", 100.0, 0, "1-URGENT"),  # → insert
        (2013, 2, "F", 250.5, 1, "3-MEDIUM"),  # → update (price drift)
        (3021, 3, "P", 300.0, 2, "5-LOW"),  # → set_copies (dup in tgt)
        (4013, 4, "O", 400.0, 3, None),  # → update, multi-copy source
        (4013, 5, "F", 401.0, 3, "5-LOW"),  # second distinct copy → residual
        (5000, 6, "O", 500.0, 4, "1-URGENT"),  # clean
    ]
    _write_orders(spark, d, rows)
    _oracle_parity(spark, d, ("recon_remediate_apply",))
    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    got = _report(registry.get("recon_remediate_apply").fn(spark, d))
    tgt_rows = [r for r in rows if r[0] % 1000 != 7]
    tgt_rows = [
        (
            k,
            c,
            s,
            (p + 1.0) if k % 1000 == 13 else p,
            1_500_000_000 + day * 86_400,
            None if k % 1000 == 34 else prio,
        )
        for k, c, s, p, day, prio in tgt_rows
    ]
    tgt_rows += [r for r in tgt_rows if r[0] % 1000 == 21]
    src_rows = [
        (k, c, s, p, 1_500_000_000 + day * 86_400, prio)
        for k, c, s, p, day, prio in rows
    ]
    assert got == _replica(src_rows, tgt_rows)
    # the multi-copy update key is the one residual
    assert got["update"][3] == 1


# ---------------------------------------------------------------------------
# property fuzz: dup-key corpora across every fault residue; per draw the
# engine must match BOTH the DuckDB oracle and the pure-Python replica
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
def test_apply_matches_oracle_and_replica_on_dup_key_corpora(spark, orders):
    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    rows = [
        (base * 1000 + res, c, s, p, day, prio)
        for base, res, c, s, p, day, prio in orders
    ]
    d = tempfile.mkdtemp(prefix="rhds_apply_fuzz_")
    try:
        _write_orders(spark, d, rows)
        _oracle_parity(spark, d, ("recon_remediate_apply",))
        got = _report(registry.get("recon_remediate_apply").fn(spark, d))
        src_rows = [
            (k, c, s, p, 1_500_000_000 + day * 86_400, prio)
            for k, c, s, p, day, prio in rows
        ]
        tgt_rows = [r for r in src_rows if r[0] % 1000 != 7]
        tgt_rows = [
            (
                k,
                c,
                s,
                (p + 1.0) if k % 1000 == 13 and p is not None else p,
                sec,
                None if k % 1000 == 34 else prio,
            )
            for k, c, s, p, sec, prio in tgt_rows
        ]
        tgt_rows += [r for r in tgt_rows if r[0] % 1000 == 21]
        assert got == _replica(src_rows, tgt_rows)
    finally:
        shutil.rmtree(d, ignore_errors=True)
