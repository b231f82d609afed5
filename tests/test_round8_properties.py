"""Round-8 operator properties: recon_bucket_hash (Merkle-style
hierarchical reconciliation, SURVEY §7.5.2).

1. Self-recon is clean: an identical pair yields ZERO report rows (the
   whole point of the digest tier — a clean check costs 256 rows).
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
from pyspark.sql import functions as F

from reconciliation_hive_data_spark.catalog import load
from reconciliation_hive_data_spark.plans.recon import orders_target
from reconciliation_hive_data_spark.plans.recon_scale import (
    _BH_BUCKETS,
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
    ).select(
        "o_orderkey",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10
            ).cast("bigint"),
            F.lit(_BH_BUCKETS),
        ).alias("bucket"),
    )
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
