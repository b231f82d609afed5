"""Round-17 battery for recon_compact_incremental — successive-compaction
incrementality audit (SURVEY §7.12 candidate 3).

Independent-expectation replica (the r16 lesson: oracle parity cannot
see a semantic written identically into both engines): `_py_compact`
recomputes the whole expected report — month keys, the deterministic
delta split (oldest-month rewrite dropping pmod10==3 keys + the
pmod50==0 new-month batch), the dynamic-overwrite scoping rule
(a partition is replaced only if the WRITTEN data contains rows for it),
file-kept counts and verdicts — in pure Python from the input rows, and
the tests assert the Spark op's ACTUAL on-disk outcome reproduces it.
That makes the real mechanism (per-write dynamic partition overwrite)
the thing under test: a mis-scoped overwrite that cleared untouched
partitions would flip STABLE months' n_files_kept to 0 and fail here
even if both engine oracles agreed.

Pins: the vet-note hazard (a dirty month whose rewrite filters away
EVERY row is NOT recompacted — dynamic overwrite never sees it), the
NULL_KEY default-partition spill staying untouched, the all-NULL-dates
empty-delta no-op (the r16 probe), NULL keys riding the rewrite
(coalesced residue -1), and a single-month corpus (dirty == only month,
NEW appears right after it).
"""

from __future__ import annotations

import pytest
import datetime as dt
import shutil
import tempfile
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from .test_round10_properties import _oracle_parity

_EPOCH = 1_500_000_000  # the r10 writer's fixed epoch (2017-07-14 UTC)


def _write_orders_nullable(spark, d: str, rows) -> None:
    """rows: (key, price, day) → {d}/orders.parquet with NULLable key and
    day (NULL day → NULL o_orderdate → the default-partition spill)."""
    spark.createDataFrame(
        [
            (k, p, _EPOCH + day * 86_400 if day is not None else None)
            for k, p, day in rows
        ],
        "o_orderkey bigint, o_totalprice double, sec bigint",
    ).select(
        "o_orderkey",
        "o_totalprice",
        F.timestamp_seconds("sec").alias("o_orderdate"),
    ).coalesce(1).write.mode("overwrite").parquet(d + "/orders.parquet")


# -- pure-Python replica ------------------------------------------------------


def _month(day) -> str | None:
    if day is None:
        return None
    t = dt.datetime.fromtimestamp(_EPOCH + day * 86_400, dt.timezone.utc)
    return t.strftime("%Y-%m")


def _py_compact(rows) -> dict:
    """(key, price, day) rows → {o_month: (n_rows_before, n_rows_after,
    n_files_kept, verdict)} — the full independent expectation."""
    recs = []
    for k, _p, day in rows:
        m = _month(day)
        k10 = k % 10 if k is not None else -1  # Python % == pmod
        k50 = k % 50 if k is not None else -1
        recs.append((m, k10, k50))
    nonnull = sorted({m for m, _, _ in recs if m is not None})
    dm = nonnull[0] if nonnull else None
    if nonnull and nonnull[-1] < "9999-12":
        y, mo = map(int, nonnull[-1].split("-"))
        y, mo = (y + 1, 1) if mo == 12 else (y, mo + 1)
        nm = f"{y:04d}-{mo:02d}"
    else:
        # ADVICE r17 clamp: max month 9999-12 is in-convention but +1
        # month leaves the 4-digit year range — the NEW branch skips
        nm = None
    n_d = sum(1 for m, k10, _ in recs if dm is not None and m == dm and k10 != 3)
    before: Counter = Counter(m for m, _, _ in recs)
    after: Counter = Counter()
    for m, k10, k50 in recs:
        if m is None or dm is None or m != dm or n_d == 0:
            after[m] += 1
        elif k10 != 3:
            after[m] += 1
        if k50 == 0 and nm is not None:
            after[nm] += 1
    out = {}
    for m in set(before) | set(after):
        nb, na = before.get(m, 0), after.get(m, 0)
        if m is None:
            v, kept = "NULL_KEY", 1
        elif nb == 0:
            v, kept = "NEW", 0
        elif m == dm and n_d > 0:
            v, kept = "RECOMPACTED", 0
        else:
            v, kept = "STABLE", 1
        out[m] = (nb, na, kept, v)
    return out


def _run(spark, rows) -> dict:
    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    d = tempfile.mkdtemp(prefix="rhds_ci17_")
    try:
        _write_orders_nullable(spark, d, rows)
        got = {
            r["o_month"]: (
                r["n_rows_before"],
                r["n_rows_after"],
                r["n_files_kept"],
                r["verdict"],
            )
            for r in registry.get("recon_compact_incremental")
            .fn(spark, d)
            .collect()
        }
        _oracle_parity(spark, d, ("recon_compact_incremental",))
        return got
    finally:
        shutil.rmtree(d, ignore_errors=True)


# -- pinned corpora -----------------------------------------------------------


def test_compact_incremental_full_shape(spark):
    """Multi-month corpus with every arm live: the oldest month loses its
    %10==3 keys (RECOMPACTED, file replaced), later months untouched
    (STABLE, file kept), the %50==0 keys land in max+1 (NEW), NULL dates
    spill to the default partition and stay untouched (NULL_KEY), a NULL
    key coalesces to residue -1 and RIDES the rewrite."""
    rows = [
        (3, 10.0, 0),        # month 2017-07, k10=3 → dropped by rewrite
        (13, 11.0, 1),       # month 2017-07, k10=3 → dropped
        (7, 12.0, 2),        # month 2017-07, kept in rewrite
        (None, 13.0, 3),     # NULL key, month 2017-07 → kept (residue -1)
        (21, 14.0, 40),      # month 2017-08 → STABLE
        (34, 15.0, 75),      # month 2017-09 (max) → STABLE
        (100, 16.0, 41),     # k50=0 → copies into NEW month 2017-10
        (None, 17.0, None),  # NULL date → NULL_KEY
    ]
    got = _run(spark, rows)
    assert got == _py_compact(rows)
    assert got == {
        "2017-07": (4, 2, 0, "RECOMPACTED"),
        "2017-08": (2, 2, 1, "STABLE"),
        "2017-09": (1, 1, 1, "STABLE"),
        "2017-10": (0, 1, 0, "NEW"),
        None: (1, 1, 1, "NULL_KEY"),
    }


def test_compact_incremental_all_filtered_dirty_month_stays_stable(spark):
    """The vet-note hazard: every key in the oldest month has residue 3,
    so the rewrite is EMPTY — dynamic overwrite never sees the month and
    must leave it untouched (STABLE, kept=1, rows intact), not clear it."""
    rows = [
        (3, 10.0, 0),    # month 2017-07, k10=3
        (23, 11.0, 1),   # month 2017-07, k10=3
        (7, 12.0, 40),   # month 2017-08
    ]
    got = _run(spark, rows)
    assert got == _py_compact(rows)
    assert got["2017-07"] == (2, 2, 1, "STABLE")


def test_compact_incremental_single_month(spark):
    rows = [(7, 10.0, 0), (50, 11.0, 1)]  # 50: k50==0 → NEW month copy
    got = _run(spark, rows)
    assert got == _py_compact(rows)
    assert got["2017-07"][3] == "RECOMPACTED"
    assert got["2017-08"] == (0, 1, 0, "NEW")


def test_compact_incremental_max_month_9999_12_clamps_new_branch(spark):
    """ADVICE r17 pin: a max month of 9999-12 is inside the documented
    1000-9999 year convention, but max+1 lands in year 10000 where the
    engines' year formatting diverges ('+10000' vs '10000'). The clamp
    turns the NEW-month branch off at the edge: k50==0 rows spawn no NEW
    month, the dirty-month rewrite still runs, and parity holds."""
    d9999 = int(
        (
            dt.datetime(9999, 12, 15, tzinfo=dt.timezone.utc).timestamp()
            - _EPOCH
        )
        // 86_400
    )
    rows = [(12, 10.0, 0), (50, 11.0, d9999), (100, 12.0, d9999)]
    got = _run(spark, rows)  # includes oracle parity
    assert got == _py_compact(rows)
    assert got["2017-07"][3] == "RECOMPACTED"
    assert got["9999-12"][3] == "STABLE"
    assert not any(v[3] == "NEW" for v in got.values())


def test_compact_incremental_all_null_dates_is_noop(spark):
    """All dates NULL → no dirty month, no new month, an EMPTY delta —
    the probed r16 mechanism: an empty dynamic overwrite must be a safe
    no-op (default partition intact), not a truncate."""
    rows = [(1, 10.0, None), (50, 11.0, None), (3, 12.0, None)]
    got = _run(spark, rows)
    assert got == _py_compact(rows)
    assert got == {None: (3, 3, 1, "NULL_KEY")}


# -- hypothesis fuzz ----------------------------------------------------------

_ROWS = st.lists(
    st.tuples(
        st.one_of(
            st.none(),
            st.integers(min_value=-60, max_value=60),
            st.sampled_from([50, 100, 3, 13, 2**40, -(2**40)]),
        ),
        st.one_of(st.none(), st.just(10.0)),
        st.one_of(st.none(), st.integers(min_value=0, max_value=90)),
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)


@pytest.mark.soak
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_ROWS)
def test_compact_incremental_matches_replica_and_oracle_fuzz(spark, rows):
    assert _run(spark, rows) == _py_compact(rows)
