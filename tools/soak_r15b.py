"""Deeper-example soak for the r15 late-round additions (the r14/r15 soak
convention: ~12 deterministic examples per new operator, beyond the 2-3
committed pins — this pass caught a real engine fork in BOTH of the last
two rounds' additions before the driver saw it).

Pools mirror the committed hostile fixtures:
- x_bpe_rounds_n / x_bpe_apply: the docs-hostile token zoo + BPE-specific
  shapes (repeated-letter runs for marker reformation, tie-dense tiny
  vocabs, special-case-mapping unicode, NULL/empty/separator-only text).
- recon_partition_evolve / recon_layout_compact: NULL/negative/
  int64-extreme keys, NULL dates, month gaps up to ~13 months,
  single-parity key sets, NULL values.

Usage: python tools/soak_r15b.py [n_examples]
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

_BPE_TOKENS = [
    "alpha", "beta", "gamma", "aaaa", "aaab", "abab", "aa", "ab",
    "banana", "bananas", "cacao", "xxyy", "xy", "x",
    "42", "3.14", "word,", "end.", "İstanbul", "KKelvin", "ẞharp",
    "héllo", "日本語", "x" * 64, "", " ", "  ",
]

_DAYS = list(range(0, 40)) + [100, 200, 400, None]
_KEYS = list(range(-6, 30)) + [None, 2**63 - 1, -(2**63), 999_999, -1000]


def _parity(spark, d, name):
    from parity import compare

    spec = registry.get(name)
    return compare(spec.fn(spark, d), spec.oracle, d, name)


def _soak_docs_corpus(spark, rng: random.Random, d: str) -> None:
    docs = []
    n = rng.randint(1, 12)
    for i in range(n):
        if rng.random() < 0.15:
            text = None
        else:
            text = " ".join(
                rng.choice(_BPE_TOKENS) for _ in range(rng.randint(1, 8))
            )
        docs.append((i, text, rng.choice([None, "en", "es"]),
                     rng.choice([None, "src0", "src1"]),
                     len(text) if text is not None else None))
    spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")


def soak_bpe(spark, rng: random.Random, d: str) -> list:
    _soak_docs_corpus(spark, rng, d)
    return _parity(spark, d, "x_bpe_rounds_n")


def soak_bpe_apply(spark, rng: random.Random, d: str) -> list:
    _soak_docs_corpus(spark, rng, d)
    return _parity(spark, d, "x_bpe_apply")


def _soak_orders_table(spark, rng: random.Random, d: str) -> None:
    keys = rng.sample(_KEYS, rng.randint(1, 14))
    rows = []
    for k in keys:
        rows.append(
            (
                k,
                rng.randint(1, 9),
                rng.choice([None, "O", "F", "P"]),
                rng.choice([None, 10.0, 99.99]),
                None
                if (day := rng.choice(_DAYS)) is None
                else 1_500_000_000 + day * 86_400,
                rng.choice([None, "5-LOW", "1-URGENT"]),
            )
        )
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, sec bigint, o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.timestamp_seconds("sec").alias("o_orderdate"), "o_orderpriority",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/orders.parquet")


def soak_partition_evolve(spark, rng: random.Random, d: str) -> list:
    _soak_orders_table(spark, rng, d)
    return _parity(spark, d, "recon_partition_evolve")


def soak_layout_compact(spark, rng: random.Random, d: str) -> list:
    _soak_orders_table(spark, rng, d)
    return _parity(spark, d, "recon_layout_compact")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    spark = get_spark("soak_r15b")
    registry.load_all_modules()
    failures = 0
    for op, fn, seed0 in (
        ("x_bpe_rounds_n", soak_bpe, 1500),
        ("recon_partition_evolve", soak_partition_evolve, 2500),
        ("x_bpe_apply", soak_bpe_apply, 3500),
        ("recon_layout_compact", soak_layout_compact, 4500),
    ):
        for i in range(n):
            # str hash() is process-salted — fixed integer seeds keep every
            # example reproducible across runs
            rng = random.Random(seed0 + i)
            d = tempfile.mkdtemp(prefix="rhds_soak_r15b_")
            try:
                problems = fn(spark, rng, d)
                tag = "OK " if not problems else "FAIL"
                if problems:
                    failures += 1
                print(f"{tag} {op} example {i}: {problems[:2] if problems else ''}")
            finally:
                shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    print(f"soak_r15b: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
