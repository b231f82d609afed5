"""Round-13 pinned regression for the TPC-H ratio-query zero-denominator
class (VERDICT r12 items 1-2).

tpch_q14 and tpch_q8 divide one aggregate by another; a month (q14) or an
order-year (q8) whose every matched lineitem carries l_discount = 1.0 is
legal data whose revenue sums to EXACTLY 0.  Under Spark 4 ANSI mode the
old plain ``/`` aborted the whole job with DIVIDE_BY_ZERO while the DuckDB
oracle's 0/0 returned NULL — the r12 fuzz falsified q14 deterministically
(hypothesis example persisted) and q8 had the identical shape.  Both now
use ``F.try_divide`` (plans/tpch.py), matching the oracle's NULL.

The hypothesis sweep in test_round12_tpchfull_properties.py CAN regenerate
this shape (discount pool contains 1.0) but is not guaranteed to each run;
this test constructs the minimal all-zero-revenue star BY HAND so the class
stays closed deterministically, independent of fuzz search luck.
"""

from __future__ import annotations

import pytest
from .parity import compare as _compare
from .test_round12_tpchfull_properties import _write_star

# Star construction (indexes into the r12 fuzz pools, reusing its writer):
#   q14 needs: lineitems with l_shipdate in [1996-09-01, 1996-10-01) that
#     match an existing part, ALL with discount = 1.0 → month revenue 0.
#   q8 needs: an order in BETWEEN 1995-01-01..1996-12-31 whose customer's
#     nation is in ASIA (nationkey % 5 == 2 under the writer's region map),
#     whose lineitems match a PROMO part and an existing supplier, ALL with
#     discount = 1.0 → that year's total volume 0.
# One star serves both: every lineitem below has disc idx 3 (= 1.0).
#
# Pool reminders: _ORDER_DATES[0] = 1995-01-01 (inside q8's BETWEEN),
# _SHIP_DATES[2] = 1996-09-01 (inside q14's month window), _PRICES[3] =
# 99999.99, _QTYS[3] = 10.0, _DISCS[3] = 1.0, _TYPES[1] = "PROMO".
_ZERO_REV_LINE = (0, 0, 3, 3, 3, "N", ("abs", 2))  # part 0, supp 0, disc 1.0

_ORDERS = [
    (1, 0, "F", 0, "1-URGENT", [_ZERO_REV_LINE, _ZERO_REV_LINE]),
    (2, 0, "O", 0, "2-HIGH", [_ZERO_REV_LINE]),
]
_CUSTOMERS = [(0, 2, 3, 1)]  # nationkey 2 → NATION_2, region 2 = ASIA
_PARTS = [(2, 1, 1, 2)]  # (name, brand, TYPE=PROMO, size) at partkey 0
_SUPPLIERS = [(2, 3)]  # suppkey 0 (dense), any nation/acctbal


@pytest.mark.soak
def test_q14_q8_zero_revenue_is_null_not_abort(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tpchzero"))
    _write_star(spark, d, _ORDERS, _CUSTOMERS, _PARTS, _SUPPLIERS)

    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    problems = []
    for name in ("tpch_q14", "tpch_q8"):
        spec = registry.get(name)
        problems += _compare(spec.fn(spark, d), spec.oracle, d, name)
    assert not problems, problems

    # Belt and braces: the q14 ratio really is the NULL-from-0/0 row (one
    # row, NULL promo_revenue), not an accidentally-empty result.
    q14 = registry.get("tpch_q14").fn(spark, d).collect()
    assert len(q14) == 1 and q14[0]["promo_revenue"] is None
