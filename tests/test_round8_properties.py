"""Round-8 operator properties: recon_bucket_hash (Merkle-style
hierarchical reconciliation, SURVEY §7.5.2).

1. Self-recon is clean: an identical pair yields ZERO report rows (the
   whole point of the digest tier — a clean check exchanges only the
   metadata-sized digest tables).
2. Injected-fault localization: every faulty key (the %1000 fault
   residues) lands in exactly one flagged bucket, the flagged-bucket set
   is exactly the md5-bucket image of the fault keys, and n_bad_keys
   sums to the fault-key count.
3. Digest invariance: the report is identical under repartitioning of
   either side (sum-mod digests are order- and partition-independent —
   the property that makes the digest mergeable across 1000 executors).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from reconciliation_hive_data_spark.catalog import load
from reconciliation_hive_data_spark.plans.recon import orders_target
from reconciliation_hive_data_spark.plans.recon_scale import (
    _bh_bucket,
    bucket_hash_report,
)

FAULT_RESIDUES = (7, 13, 21, 34)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load(spark, sf_dir, "orders").cache()


def test_bucket_hash_self_recon_clean(spark, orders):
    assert bucket_hash_report(orders, orders_target(orders, faulty=False)).count() == 0


def test_bucket_hash_localizes_injected_faults(spark, orders):
    report = bucket_hash_report(orders, orders_target(orders)).collect()
    fault_keys = orders.filter(
        (F.col("o_orderkey") % 1000).isin(*FAULT_RESIDUES)
    ).select("o_orderkey", _bh_bucket().alias("bucket"))
    per_bucket = {
        r.bucket: r.n
        for r in fault_keys.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert {r.bucket for r in report} == set(per_bucket)
    assert {r.bucket: r.n_bad_keys for r in report} == per_bucket
    assert sum(r.n_bad_keys for r in report) == fault_keys.count()


def test_bucket_hash_digest_partition_invariance(spark, orders):
    base = sorted(
        map(tuple, bucket_hash_report(orders, orders_target(orders)).collect())
    )
    shuffled = sorted(
        map(
            tuple,
            bucket_hash_report(
                orders.repartition(13), orders_target(orders).repartition(7)
            ).collect(),
        )
    )
    assert base == shuffled


_FUZZ_MOD = 97


@st.composite
def _bh_fault_plan(draw):
    residues = st.integers(min_value=0, max_value=_FUZZ_MOD - 1)
    drop = draw(residues)
    dup = draw(residues.filter(lambda r: r != drop))
    drift = draw(residues.filter(lambda r: r not in (drop, dup)))
    return drop, dup, drift


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan=_bh_fault_plan())
def test_bucket_hash_fuzz_localizes_arbitrary_faults(spark, orders, plan):
    """Random fault residues (drop / duplicate / drift) must surface as
    flagged buckets that are EXACTLY the md5-bucket image of the faulted
    keys, with n_bad_keys matching per bucket — no fault class hides from
    the digest tier and no clean bucket is ever flagged."""
    drop, dup, drift = plan
    key = F.col("o_orderkey")
    tgt = orders.filter(key % _FUZZ_MOD != drop).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.when(key % _FUZZ_MOD == drift, F.col("o_totalprice") + 5.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    tgt = tgt.unionByName(tgt.filter(key % _FUZZ_MOD == dup))

    report = bucket_hash_report(orders, tgt).collect()
    faulted = orders.filter(
        (key % _FUZZ_MOD).isin(drop, dup, drift)
    ).select(_bh_bucket().alias("bucket"))
    expected = {
        r.bucket: r.n
        for r in faulted.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert {r.bucket: r.n_bad_keys for r in report} == expected
