"""Deeper-example soak for the r17 addition (the r14/r15/r16 soak
convention: ~12 deterministic examples beyond the committed pins — this
pass caught a real engine fork in both the r14 and r15 additions before
the driver saw it).

x_bpe_pack pool: the hostile-documents zoo EXTENDED with the shapes the
post-BPE packing specifically risks:

- zero-word docs (digits/punctuation only) and NULL/empty text — the
  left-join/COALESCE-0 path must keep them IN the packing;
- merge-fertile words (self-overlapping 'aaaa', dense 'the/theory'
  prefixes) so the three elections actually fire and marker-space
  lengths diverge hard from whitespace counts;
- election TIES (equal-count pairs → lexicographic tie-break must agree
  across Spark, DuckDB, and the pure-Python replica);
- long documents ('word ' * ~1500) so the running totals actually cross
  the 2048 cap inside a shard — real boundary traffic, not just seq 0;
- special-case-mapping characters ('İ' U+0130, Kelvin sign U+212A) that
  FORK the lower(text) family — the BPE ops' ASCII-extract-then-lower
  tokenizer is immune by construction, and the soak proves it;
- doc_ids spanning negatives / 40-bit / dense small ints for shard
  stability and co-sharded window groups.

Each draw asserts BOTH gates: DuckDB oracle parity through the real
registered query + sf_dir load path, AND the pure-Python replica from
tests/test_round17_bpe_pack.py (the independent expectation — parity
alone cannot see a semantic written identically into both engines).

Usage: python tools/soak_r17.py [n_examples]
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from reconciliation_hive_data_spark.session import get_spark  # noqa: E402
from reconciliation_hive_data_spark import registry  # noqa: E402

_TEXT_POOL = [
    None,
    "",
    " ",
    "123 456 !!! ...",                      # zero extractable words
    "the theory of everything",
    "the the the theory thesis",
    "aaaa aaaa aaab bbbb",                  # self-overlapping merges
    "ab ab cd cd",                          # election tie bait
    "İstanbul KELVİN KK sign",         # case-mapping forks: immune
    "héllo naïve 日本語 the",                # multibyte; ASCII runs only
    "word " * 1500,                         # crosses the 2048 cap
    "token " * 700,
    "x" * 64,
    "a b c d e f g h",                      # single-letter words: no pairs
]

_ID_POOL = (
    list(range(0, 40))
    + [-1, -17, 999_950, 999_990, 2**40, 2**40 + 3, -(2**31)]
)


def _draw(rng: random.Random):
    n = rng.randint(1, 14)
    ids = rng.sample(_ID_POOL, n)
    return [
        (
            i,
            rng.choice(_TEXT_POOL),
            rng.choice([None, "en", "es", "zh"]),
            rng.choice([None, "src0", "src1"]),
        )
        for i in ids
    ]


def main() -> int:
    n_examples = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from tests.test_round10_properties import _oracle_parity  # noqa: E402
    from tests.test_round13_docs_hostile_properties import (  # noqa: E402
        _write_documents_nullable,
    )
    from tests.test_round17_bpe_pack import (  # noqa: E402
        _BPE_PACK_CAP,
        _py_bpe_pack,
        _spark_pack,
    )

    registry.load_all_modules()
    spark = get_spark("soak-r17", shuffle_partitions=8)
    rng = random.Random(171717)
    failures = 0
    for ex in range(n_examples):
        docs = _draw(rng)
        d = tempfile.mkdtemp(prefix="rhds_soak17_")
        try:
            _write_documents_nullable(spark, d, docs)
            _oracle_parity(spark, d, ("x_bpe_pack",))
            got = _spark_pack(spark, docs, _BPE_PACK_CAP)
            want = _py_bpe_pack(docs, _BPE_PACK_CAP)
            assert got == want, f"replica mismatch: {got} != {want}"
            print(f"[{ex + 1:2d}/{n_examples}] ok  ({len(docs)} docs)")
        except AssertionError as e:
            failures += 1
            print(f"[{ex + 1:2d}/{n_examples}] FAIL {str(e)[:500]}")
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(f"\nx_bpe_pack: {n_examples - failures}/{n_examples} clean")
    f2 = soak_compact_incremental(spark, n_examples)
    print(f"recon_compact_incremental: {n_examples - f2}/{n_examples} clean")
    f3 = soak_drop_list(spark, n_examples)
    print(f"x_dedup_drop_list: {n_examples - f3}/{n_examples} clean")
    return 1 if failures or f2 or f3 else 0




# -- second r17 addition: recon_compact_incremental ---------------------------
#
# Pool: the orders zoo with NULL/negative/huge keys and NULL/sparse days,
# biased toward the audit's hazard shapes — residue-3-saturated oldest
# months (the all-filtered dirty-month no-recompact rule), %50==0 keys
# (NEW-month traffic), NULL dates (default-partition spill), and
# month-boundary days. Each draw asserts the pure-Python replica (which
# predicts the on-disk outcome incl. n_files_kept) AND DuckDB oracle
# parity through the real registered query.

_CI_KEYS = [None, 3, 13, 23, 33, 7, 21, 50, 100, 150, -7, -3, -50,
            2**40, 2**40 + 3, 999_999, 1, 2]
_CI_DAYS = [None, 0, 1, 17, 18, 19, 30, 31, 48, 49, 79, 80, 90]


def soak_compact_incremental(spark, n_examples: int) -> int:
    from tests.test_round17_compact_incremental import _py_compact, _run

    rng = random.Random(272727)
    failures = 0
    for ex in range(n_examples):
        n = rng.randint(1, 14)
        keys = rng.sample(_CI_KEYS, n)
        rows = [
            (k, rng.choice([None, 10.0, 99.99]), rng.choice(_CI_DAYS))
            for k in keys
        ]
        try:
            got = _run(spark, rows)  # also runs oracle parity inside
            want = _py_compact(rows)
            assert got == want, f"replica mismatch: {got} != {want}"
            print(f"[{ex + 1:2d}/{n_examples}] ok  ({n} orders)")
        except AssertionError as e:
            failures += 1
            print(f"[{ex + 1:2d}/{n_examples}] FAIL {str(e)[:500]}")
    return failures



# -- third r17 addition: x_dedup_drop_list ------------------------------------
#
# Pool: the bpe-pack doc zoo reused (NULL/empty text, zero-word docs,
# unicode, dense dup space via the tiny-vocab texts) — the interesting
# shapes here are IDENTICAL texts under distinct ids (cluster traffic)
# and %50/%250 ids (version-chain expansion). Each draw asserts the
# pure-Python text-group/min-survivor replica AND DuckDB oracle parity.


def soak_drop_list(spark, n_examples: int) -> int:
    from tests.test_round10_properties import _oracle_parity
    from tests.test_round13_docs_hostile_properties import (
        _write_documents_nullable,
    )
    from tests.test_round17_drop_list import (
        _check_invariants,
        _py_drop_list,
        _run,
    )

    rng = random.Random(373737)
    # id pool honors the derived-id injectivity precondition (the r13
    # scaffolding contract pinned in the hostile family's _DOC_IDS note):
    # no id may equal another id + k*1_000_000, so negative multiples of
    # 50 (e.g. -50 -> +1M copy at 999_950) are excluded alongside raw
    # 1_000_000 itself
    dup_ids = [0, 50, 250, 999_950, -20, 1, 2, 3, 7, 11, 500, 750]
    failures = 0
    for ex in range(n_examples):
        n = rng.randint(1, 11)
        ids = rng.sample(dup_ids, n)
        texts = [rng.choice(_TEXT_POOL[:8]) for _ in ids]  # small pool → dups
        docs = [(i, t, rng.choice([None, "en"]), None)
                for i, t in zip(ids, texts)]
        d = tempfile.mkdtemp(prefix="rhds_soak17c_")
        try:
            got = _run(spark, docs)
            want = _py_drop_list(docs)
            assert got == want, f"replica mismatch: {got} != {want}"
            _check_invariants(got)
            _write_documents_nullable(spark, d, docs)
            _oracle_parity(spark, d, ("x_dedup_drop_list",))
            print(f"[{ex + 1:2d}/{n_examples}] ok  ({n} docs)")
        except AssertionError as e:
            failures += 1
            print(f"[{ex + 1:2d}/{n_examples}] FAIL {str(e)[:500]}")
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
