"""Deeper-example soak for the r16 addition (the r14/r15 soak convention:
~12 deterministic examples beyond the committed pins — this pass caught a
real engine fork in BOTH of the r14 and r15 additions before the driver
saw it).

recon_remediate pool: the r15 orders zoo (NULL/negative/int64-extreme
keys, NULL status/price/priority, sparse day grid) EXTENDED with the
shapes the remediation election specifically risks and which the
round-10 writer (unique keys) never produces:

- duplicate source keys with DISTINCT payloads (multi-copy election);
- duplicate source keys with sub-1e-6 price twins (election-key ties
  that must stay value-invisible in canonical units);
- NULL payload fields on the ELECTED copy (the DuckDB scalar-arg_min
  NULL-skip hazard the struct election closes);
- fault residues (%1000 in 7/13/21/34) so every fixture-reachable action
  arm fires alongside the hostile shapes.

The delete arm is NOT reachable through the registered pair by
construction (orders_target's keys ⊆ source keys) — it is pinned at the
remediation_plan level in tests/test_round16_remediate.py instead.

Usage: python tools/soak_r16.py [n_examples]
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from reconciliation_hive_data_spark.session import get_spark  # noqa: E402
from reconciliation_hive_data_spark import registry  # noqa: E402

#: key pool mixes fault residues with hostile magnitudes; duplicates are
#: injected separately below
_KEYS = (
    [b * 1000 + r for b in range(0, 4) for r in (0, 7, 13, 21, 34)]
    + [None, 2**63 - 1, -(2**63), -1007, -2013, 999_999]
)
_PRICES = [None, 10.0, 99.99, 123.456789, 0.0, 1e12]
_PRIOS = [None, "5-LOW", "1-URGENT", "", "ẞ-UNICODE"]
_STATUSES = [None, "O", "F", "P", ""]
_DAYS = list(range(0, 40)) + [400, None]


def _soak_orders_table(spark, rng: random.Random, d: str) -> None:
    keys = rng.sample(_KEYS, rng.randint(2, 14))
    rows = []
    for k in keys:
        rows.append(
            (
                k,
                rng.randint(1, 9),
                rng.choice(_STATUSES),
                rng.choice(_PRICES),
                None
                if (day := rng.choice(_DAYS)) is None
                else 1_500_000_000 + day * 86_400,
                rng.choice(_PRIOS),
            )
        )
        # multi-copy shapes: a second DISTINCT payload copy, a sub-1e-6
        # price twin, or an exact duplicate of the first copy
        if k is not None and rng.random() < 0.5:
            shape = rng.random()
            if shape < 0.4:  # distinct payload (election must pick min text)
                rows.append(
                    (
                        k,
                        rng.randint(1, 9),
                        rng.choice(_STATUSES),
                        rng.choice(_PRICES),
                        1_500_000_000 + rng.choice(range(40)) * 86_400,
                        rng.choice(_PRIOS),
                    )
                )
            elif shape < 0.7 and rows[-1][3] is not None:  # sub-µ twin
                rows.append(rows[-1][:3] + (rows[-1][3] + 4e-8,) + rows[-1][4:])
            else:  # exact duplicate (copy-count shapes)
                rows.append(rows[-1])
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, sec bigint, o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.timestamp_seconds("sec").alias("o_orderdate"), "o_orderpriority",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/orders.parquet")


def _parity(spark, d, name):
    from parity import compare

    spec = registry.get(name)
    return compare(spec.fn(spark, d), spec.oracle, d, name)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    spark = get_spark("soak_r16")
    registry.load_all_modules()
    failures = 0
    for i in range(n):
        rng = random.Random(16_000 + i)
        d = tempfile.mkdtemp(prefix="rhds_soak_r16_")
        try:
            _soak_orders_table(spark, rng, d)
            problems = _parity(spark, d, "recon_remediate")
            tag = "OK " if not problems else "FAIL"
            if problems:
                failures += 1
            print(f"{tag} recon_remediate example {i}:"
                  f" {problems[:2] if problems else ''}")
        finally:
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    print(f"soak_r16: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
