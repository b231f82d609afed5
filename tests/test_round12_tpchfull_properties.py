"""Round-12 boundary fuzz for the REMAINING 16 TPC-H composites (q2 q3 q5
q7 q8 q9 q10 q11 q12 q14 q15 q16 q17 q19 q20 q21) — the companion to
tests/test_round12_properties.py's q1/q4/q6/q13/q18/q22 sweep, now over the
full star schema (nation/region/supplier/part dims + the derived-partsupp
quartet).

Every pool value sits ON a predicate edge some query cares about:

- order dates straddle q5/q10's half-open [1996-01-01, …) windows, q8's
  INCLUSIVE BETWEEN '1995-01-01'..'1996-12-31' endpoint, and q3's
  strict < '1997-03-15' cut;
- ship dates straddle q14/q15's month windows, q7's inclusive BETWEEN,
  q3's strict >, and (via relative deltas) q12's +60-day and q21's
  +90-day strictly-greater lateness edges to the second;
- quantities sit on q19's BETWEEN 1..11 / 10..20 / 20..30 seams and feed
  q17's 0.2·avg correlated cutoff (small per-part groups make the
  average land ON a member value);
- part attrs cover q19's exact brand triple, q2/q16's size/type
  equalities, q9/q16's LIKE/NOT-LIKE patterns ('red' as word, substring,
  wrong case), and NULLs in every filter column (three-valued logic must
  drop them identically in both engines);
- dangling keys in every direction: customerless orders, orderless
  customers, lineitems pointing past the part/supplier tables, customer
  nationkeys beyond the nation dim — inner joins must drop them
  identically everywhere;
- supplier keys stay DENSE 0..n-1: the reference-shape synthetic
  partsupp (plans/tpch.py PARTSUPP_CTE) derives ps_suppkey by modulo
  over the supplier count, the same convention the fixture uses.

q15's total_revenue = MAX tie returns every tied supplier (both engines,
no LIMIT); q3/q10/q21's LIMIT carries a unique-key tiebreak, so result
sets stay deterministic under the dense ties this fuzz manufactures.
"""

from __future__ import annotations

import pytest
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .parity import compare as _compare

_NAMES = (
    "tpch_q2", "tpch_q3", "tpch_q5", "tpch_q7", "tpch_q8", "tpch_q9",
    "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q14", "tpch_q15", "tpch_q16",
    "tpch_q17", "tpch_q19", "tpch_q20", "tpch_q21",
)

_ORDER_DATES = [
    datetime(1995, 1, 1),
    datetime(1995, 12, 31, 23, 59, 59),
    datetime(1996, 1, 1),
    datetime(1996, 3, 31, 23, 59, 59),
    datetime(1996, 4, 1),
    datetime(1996, 12, 31, 23, 59, 59),
    datetime(1997, 1, 1),
    datetime(1997, 3, 14, 23, 59, 59),
    datetime(1997, 3, 15),
]
_SHIP_DELTAS = [
    timedelta(days=59),
    timedelta(days=60),
    timedelta(days=60, seconds=1),
    timedelta(days=90),
    timedelta(days=90, seconds=1),
]
_SHIP_DATES = [
    datetime(1994, 12, 31, 23, 59, 59),
    datetime(1995, 1, 1),
    datetime(1996, 9, 1),
    datetime(1996, 9, 30, 23, 59, 59),
    datetime(1996, 10, 1),
    datetime(1996, 12, 31),
    datetime(1997, 1, 1),
    datetime(1997, 3, 15),
    datetime(1997, 3, 15, 0, 0, 1),
]
_QTYS = [None, 0.5, 1.0, 10.0, 11.0, 15.0, 20.0, 30.0]
_PRICES = [None, 0.01, 100.0, 99999.99, 123.45]
_DISCS = [None, 0.0, 0.05, 1.0]
_BRANDS = [None, "Brand#11", "Brand#12", "Brand#13", "Brand#1"]
_SIZES = [None, 1, 11, 15, 16, 25, 35, 36, 50]
_TYPES = [None, "PROMO", "SMALL", "ECONOMY"]
_PNAMES = [None, "", "red bolt", "dark red rod", "xredy", "RED widget",
           "blue rod", "shred wire"]
_SEGMENTS = [None, "BUILDING", "AUTOMOBILE"]
_MONEY = [None, -5.0, 0.0, 0.01, 123.45, 9999.99]

#: one lineitem: partkey, suppkey, qty idx, price idx, disc idx, returnflag,
#: ship spec ("rel", delta idx) or ("abs", date idx)
_LINE = st.tuples(
    st.integers(min_value=0, max_value=14),       # parts 0..11 exist; 12+ dangle
    st.integers(min_value=0, max_value=8),        # suppliers 0..6 exist; 7+ dangle
    st.integers(0, len(_QTYS) - 1),
    st.integers(0, len(_PRICES) - 1),
    st.integers(0, len(_DISCS) - 1),
    st.sampled_from(["R", "A", "N"]),
    st.one_of(
        st.tuples(st.just("rel"), st.integers(0, len(_SHIP_DELTAS) - 1)),
        st.tuples(st.just("abs"), st.integers(0, len(_SHIP_DATES) - 1)),
    ),
)
_ORDERS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=999),              # orderkey
        st.integers(min_value=0, max_value=22),               # custkey (20+ dangle)
        st.sampled_from(["F", "O", "P"]),
        st.integers(0, len(_ORDER_DATES) - 1),
        st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
        st.lists(_LINE, min_size=0, max_size=3),
    ),
    min_size=2,
    max_size=14,
    unique_by=lambda o: o[0],
)
_CUSTOMERS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=19),
        st.integers(min_value=0, max_value=26),               # 25+ dangle past nation
        st.integers(0, len(_MONEY) - 1),
        st.integers(0, len(_SEGMENTS) - 1),
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda c: c[0],
)
_PARTS = st.lists(
    st.tuples(
        st.integers(0, len(_PNAMES) - 1),
        st.integers(0, len(_BRANDS) - 1),
        st.integers(0, len(_TYPES) - 1),
        st.integers(0, len(_SIZES) - 1),
    ),
    min_size=4,
    max_size=12,
)
_SUPPLIERS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=26),               # nationkey
        st.integers(0, len(_MONEY) - 1),
    ),
    min_size=1,
    max_size=7,
)


def _write_star(spark, d, orders, customers, parts, suppliers):
    spark.createDataFrame(
        [(k, f"NATION_{k}", k % 5) for k in range(25)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/nation.parquet")
    spark.createDataFrame(
        [(0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
         (4, "MIDDLE EAST")],
        "r_regionkey int, r_name string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/region.parquet")
    spark.createDataFrame(
        [(k, f"Customer#{k}", n, _MONEY[bi], _SEGMENTS[si])
         for k, n, bi, si in customers],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/customer.parquet")
    spark.createDataFrame(
        [(i, f"Supplier#{i}", n, _MONEY[bi])
         for i, (n, bi) in enumerate(suppliers)],   # DENSE 0..n-1 (partsupp modulo)
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/supplier.parquet")
    spark.createDataFrame(
        [(i, _PNAMES[ni], _BRANDS[bi], _TYPES[ti], _SIZES[si], 100.0 + i)
         for i, (ni, bi, ti, si) in enumerate(parts)],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/part.parquet")
    o_rows, l_rows = [], []
    for okey, ckey, status, di, prio, lines in orders:
        odate = _ORDER_DATES[di]
        o_rows.append((okey, ckey, status, 1000.0 + okey, odate, prio))
        for ln, (pk, sk, qi, pi, dii, rf, (kind, si)) in enumerate(lines):
            ship = odate + _SHIP_DELTAS[si] if kind == "rel" else _SHIP_DATES[si]
            l_rows.append(
                (okey, pk, sk, ln, _QTYS[qi], _PRICES[pi], _DISCS[dii],
                 0.02, rf, "O", ship)
            )
    spark.createDataFrame(
        o_rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/orders.parquet")
    spark.createDataFrame(
        l_rows or [(1, 0, 0, 0, None, None, None, 0.02, "N", "O", None)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/lineitem.parquet")


@pytest.mark.soak
@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    orders=_ORDERS, customers=_CUSTOMERS, parts=_PARTS, suppliers=_SUPPLIERS
)
def test_tpch_full_suite_matches_oracle_on_fuzzed_star(
    spark, tmp_path_factory, orders, customers, parts, suppliers
):
    d = str(tmp_path_factory.mktemp("tpchfull"))
    _write_star(spark, d, orders, customers, parts, suppliers)

    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    problems = []
    for name in _NAMES:
        spec = registry.get(name)
        problems += _compare(spec.fn(spark, d), spec.oracle, d, name)
    assert not problems, problems
