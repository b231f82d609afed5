"""Round-14 pinned regression for sketch_kmv's crafted-key tau=0 abort
(ADVICE r13).

The KMV estimator is (c-1)*DOMAIN/tau where tau is the k-th smallest
48-bit md5-prefix hash.  The r13 division audit adjudicated the plain
ANSI ``/`` safe on a probabilistic argument (P[tau=0] ~ 2^-48 per key),
but md5 is UNKEYED: an adversary can brute-force custkeys whose md5
starts with 12 zero hex chars and feed a side containing only such keys,
making tau exactly 0 — the plain ``/`` then ANSI-aborts the whole Spark
job while the DuckDB oracle's x/0 returns NULL (the abort-vs-NULL
divergence class r12/r13 closed everywhere else).  The fix routes all
four estimator expressions through ``F.try_divide``.

Unlike the r13 zero-denominator pins, the degenerate input CANNOT be
constructed here — finding one md5 preimage with 12 leading zero hex
chars costs ~2^48 trials.  The pin is therefore plan-level: every
division in sketch_kmv's analyzed plan must be a try_divide (NULL on
zero, both engines agree), with an expression-level sanity check that
this Spark build's try_divide(x, 0.0) really is NULL, plus fixture
parity so the rewrite moved nothing on well-behaved data.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from reconciliation_hive_data_spark.plans.sketches import sketch_kmv

from .parity import compare as _compare


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001


def test_kmv_estimator_divisions_are_all_try_divide(spark, sf_dir):
    plan = _analyzed(sketch_kmv(spark, sf_dir))
    # est_a, est_b, est_union + the three folded into est_inter = 6 sites
    assert plan.count("try_divide") == 6, plan
    # and no bare ANSI Divide survives anywhere in the query: every `/`
    # rendered in the analyzed plan is part of a try_divide call
    bare = [
        m.start()
        for m in re.finditer(r" / ", plan)
        if "try_divide" not in plan[max(0, m.start() - 200) : m.start()]
    ]
    assert not bare, plan


def test_try_divide_by_zero_is_null_not_abort(spark):
    # the contract the plan pin relies on: TRY eval mode yields NULL on a
    # zero denominator under ANSI, matching DuckDB's x/0 convention
    row = (
        spark.range(1)
        .select(F.try_divide(F.lit(63.0) * 281474976710656.0, F.lit(0.0)).alias("e"))
        .collect()[0]
    )
    assert row["e"] is None


def test_kmv_fixture_parity_unmoved(spark, sf_dir):
    # the rewrite is behavior-preserving on non-degenerate data: fixture
    # taus are large positive, so the estimate must match the oracle
    # hash-for-hash exactly as before
    problems = _compare(
        sketch_kmv(spark, sf_dir),
        __import__(
            "reconciliation_hive_data_spark.registry", fromlist=["get"]
        ).get("sketch_kmv").oracle,
        sf_dir,
        "sketch_kmv",
    )
    assert not problems, problems
