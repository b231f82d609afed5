"""Deeper-example soak for the r18 addition (the r14-r17 soak convention:
~12 deterministic examples beyond the committed pins — this pass caught a
real fork in the r14 and r15 additions and a scaffolding-contract
violation in r17 before the driver saw it).

recon_remediate_apply pool: the duplicate-key orders zoo biased toward
the convergence tier's hazard shapes:

- multi-copy source keys with DISTINCT payloads (honest-residual traffic:
  the single-payload write list can never reproduce them);
- multi-copy source keys with IDENTICAL payloads (must converge);
- sub-micro price twins (tie on the canonical election key; the emitted
  payload is the shared canonical value → converge);
- every fault residue of the registered fixture (7 insert / 13 update /
  21 set_copies / 34 priority-null update) plus clean keys;
- NEGATIVE keys — Spark/DuckDB `%` is remainder (sign of dividend), NOT
  Python's floor mod, so the replica's target derivation uses
  truncating-division remainder to mirror both engines;
- extreme 40-bit keys and NULL keys (invisible to the drill; the target
  CTE's `% 1000 <> 7` filter also drops them NULL-wise on both engines);
- NULL payload fields riding elections.

Each draw asserts BOTH gates on the REGISTERED query through the real
sf_dir load path: DuckDB oracle parity, and the pure-Python replica from
tests/test_round18_remediate_apply.py (the independent expectation —
parity alone cannot see a semantic written identically into both
engines).

Usage: python tools/soak_r18.py [n_examples]
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from reconciliation_hive_data_spark import registry  # noqa: E402
from reconciliation_hive_data_spark.session import get_spark  # noqa: E402

_EPOCH = 1_500_000_000

#: key pool: fault residues on positive, negative, and 40-bit bases; small
#: enough that sampling WITH replacement forces multi-copy keys often
_KEY_POOL = [
    7, 13, 21, 34, 1000, 1007, 1013, 1021, 1034, 2000,
    -7, -13, -21, -34, -1000,
    (2**40) * 1000 + 7, (2**40) * 1000 + 13, (2**40) * 1000 + 21,
    None,
]

_PRICES = [None, 100.0, 250.75, 0.01, 99.99, 123.456789,
           100.0000001, 100.0000004]  # last two: sub-micro canonical twins
_STATUSES = ["O", "F", "P", None]
_PRIOS = ["1-URGENT", "3-MEDIUM", "5-LOW", None]
_DAYS = [0, 1, 17, 30, 365]


def _rem(k: int, m: int) -> int:
    """Spark/DuckDB `%`: truncating-division remainder (sign of dividend);
    Python's `%` floors instead, so -2987 % 1000 differs (13 vs -987).
    Pure-integer arithmetic (float division would blur 40-bit keys)."""
    r = abs(k) % m
    return r if k >= 0 else -r


def _tgt_rows(src_rows):
    """Python twin of plans/recon.orders_target(faulty=True) under engine
    remainder semantics; NULL keys drop (the CTE's NULL-propagating
    filter)."""
    kept = [
        r for r in src_rows if r[0] is not None and _rem(r[0], 1000) != 7
    ]
    out = []
    for k, c, s, p, sec, prio in kept:
        out.append(
            (
                k,
                c,
                s,
                (p + 1.0) if _rem(k, 1000) == 13 and p is not None else p,
                sec,
                None if _rem(k, 1000) == 34 else prio,
            )
        )
    out += [r for r in out if _rem(r[0], 1000) == 21]
    return out


def _draw(rng: random.Random):
    n = rng.randint(1, 14)
    return [
        (
            rng.choice(_KEY_POOL),
            rng.randint(1, 9),
            rng.choice(_STATUSES),
            rng.choice(_PRICES),
            rng.choice(_DAYS),
            rng.choice(_PRIOS),
        )
        for _ in range(n)
    ]


def main() -> int:
    n_examples = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from tests.test_round10_properties import (  # noqa: E402
        _oracle_parity,
        _write_orders,
    )
    from tests.test_round18_remediate_apply import (  # noqa: E402
        _replica,
        _report,
    )

    registry.load_all_modules()
    spark = get_spark("soak-r18", shuffle_partitions=8)
    rng = random.Random(181818)
    failures = 0
    for ex in range(n_examples):
        rows = _draw(rng)
        d = tempfile.mkdtemp(prefix="rhds_soak18_")
        try:
            _write_orders(spark, d, rows)
            _oracle_parity(spark, d, ("recon_remediate_apply",))
            got = _report(
                registry.get("recon_remediate_apply").fn(spark, d)
            )
            src_rows = [
                (k, c, s, p, _EPOCH + day * 86_400, prio)
                for k, c, s, p, day, prio in rows
            ]
            want = _replica(src_rows, _tgt_rows(src_rows))
            assert got == want, f"replica mismatch: {got} != {want}"
            print(f"[{ex + 1:2d}/{n_examples}] ok  ({len(rows)} orders)")
        except AssertionError as e:
            failures += 1
            print(f"[{ex + 1:2d}/{n_examples}] FAIL {str(e)[:500]}")
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(
        f"\nrecon_remediate_apply: {n_examples - failures}/{n_examples} clean"
    )
    f2 = soak_semantic(spark, n_examples)
    print(f"x_dedup_semantic: {n_examples - f2}/{n_examples} clean")
    f3 = soak_recall(spark, n_examples)
    print(f"x_sim_recall: {n_examples - f3}/{n_examples} clean")
    return 1 if failures or f2 or f3 else 0


# -- second r18 addition: x_dedup_semantic ------------------------------------
#
# Pool: dyadic-exact vectors (no float32 storage drift) spanning the
# hazard shapes — exact duplicates under distinct ids (drop traffic),
# sign-boundary twins (cross-bucket recall misses), zero vectors and
# NULL/truncated embeddings (NULL-cosine keeps), scaled copies (cos 1.0
# exactly under dyadic arithmetic), and near-threshold directions. Each
# draw asserts DuckDB oracle parity through the registered query AND the
# pure-Python replica from tests/test_round18_semantic.py.

_SEM_VEC_POOL = [
    None,
    [],
    [0.0] * 64,
    [1.0] + [0.0] * 63,
    [2.0] + [0.0] * 63,            # scaled copy: cos exactly 1.0
    [-1.0] + [0.0] * 63,           # sign twin: other bucket
    [1.0, 1.0] + [0.0] * 62,
    [0.5, 0.5] + [0.0] * 62,       # scaled copy of the above
    [1.0, 0.25] + [0.0] * 62,      # cos vs [1,0] ≈ 0.970 < τ
    [1.0, 0.125] + [0.0] * 62,     # cos vs [1,0] ≈ 0.992 ≥ τ
    [1.0] * 4,                     # truncated
    [1.0] * 8 + [0.0] * 56,
    [0.5] * 64,
]


def soak_semantic(spark, n_examples: int) -> int:
    from tests.test_round10_properties import _oracle_parity
    from tests.test_round13_emb_hostile_properties import _write_embeddings
    from tests.test_round18_semantic import _py_semantic, _run

    rng = random.Random(282828)
    failures = 0
    for ex in range(n_examples):
        n = rng.randint(1, 13)
        vecs = [rng.choice(_SEM_VEC_POOL) for _ in range(n)]
        d = tempfile.mkdtemp(prefix="rhds_soak18s_")
        try:
            _write_embeddings(d, vecs)
            got = _run(spark, d)
            want = _py_semantic(list(enumerate(vecs)))
            assert got == want, f"replica mismatch: {got} != {want}"
            _oracle_parity(spark, d, ("x_dedup_semantic",))
            print(f"[{ex + 1:2d}/{n_examples}] ok  ({n} vectors)")
        except AssertionError as e:
            failures += 1
            print(f"[{ex + 1:2d}/{n_examples}] FAIL {str(e)[:500]}")
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return failures


# -- third r18 addition: x_sim_recall -----------------------------------------
#
# Pool: the semantic pool's dyadic vectors (tie-heavy: scaled copies make
# exact cosine ties the COMMON case, stressing the vec_id tie-break at
# the rank-10 boundary) + NULL/zero/truncated vectors. Draw sizes up to
# 13 keep sub-k lists in play; id 1 (and 101 via +100 draws) sample as
# queries. Each draw asserts DuckDB oracle parity AND the pure-Python
# replica.


def soak_recall(spark, n_examples: int) -> int:
    from tests.test_round10_properties import _oracle_parity
    from tests.test_round13_emb_hostile_properties import _write_embeddings
    from tests.test_round18_recall import _py_recall, _run

    rng = random.Random(383838)
    failures = 0
    for ex in range(n_examples):
        n = rng.randint(2, 13)
        vecs = [rng.choice(_SEM_VEC_POOL) for _ in range(n)]
        d = tempfile.mkdtemp(prefix="rhds_soak18r_")
        try:
            _write_embeddings(d, vecs)
            got = _run(spark, d)
            want = _py_recall(list(enumerate(vecs)))
            assert got == want, f"replica mismatch: {got} != {want}"
            _oracle_parity(spark, d, ("x_sim_recall",))
            print(f"[{ex + 1:2d}/{n_examples}] ok  ({n} vectors)")
        except AssertionError as e:
            failures += 1
            print(f"[{ex + 1:2d}/{n_examples}] FAIL {str(e)[:500]}")
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
