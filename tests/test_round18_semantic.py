"""Round-18 x_dedup_semantic pins (SURVEY §7.14 vet note).

SemDeDup-style semantic prune: bucket embeddings by the deterministic
8-bit sign signature (x_sim_ivf's coarse quantizer), drop every vector
that has a LOWER-id same-bucket neighbor with cosine >= 0.99
(keep-earliest greedy; the witness's own verdict is irrelevant — the
cluster-prune semantics of Abbas et al. 2023 with vec_id as the keep
priority).

Replica-first discipline: :func:`_py_semantic` recomputes the whole
verdict list in pure Python — float32 quantization, the sign signature
(NULL/short vectors → bit 0), the EXACT left-fold dot order both engines
use (bit-identical doubles, so even threshold-boundary draws agree), the
zero-norm NULL-cosine rule, and the length-mismatch NULL rule — outside
both engines.

Pinned hazards from the vet note:

- injected exact duplicates (vec_id%100==0 → +1M twin) must DROP with
  the original as witness;
- zero-norm vectors never drop and never witness (cos NULL);
- NULL embeddings land in bucket 0 (every sign bit 0) and truncated
  ones get sign bits for present dims only; neither ever qualifies
  against a different-length vector (cos NULL on both engines — the
  oracle carries an explicit equal-length guard mirroring Spark's
  zip_with NULL padding);
- keep-earliest is on vec_id, not arrival order: the minimum qualifying
  lower id is the witness;
- same-bucket requirement: a cosine-identical pair in DIFFERENT buckets
  is NOT a dup pair (the IVF prune is the documented recall trade).
"""

from __future__ import annotations

import math
import shutil
import tempfile

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .test_round10_properties import _oracle_parity
from .test_round13_emb_hostile_properties import _write_embeddings

_TAU = 0.99


def _f32(v):
    return float(np.float32(v))


def _sig(e) -> int:
    s = 0
    if e is None:
        return 0
    for i in range(8):
        v = e[i] if i < len(e) else None
        if v is not None and not math.isnan(_f32(v)) and _f32(v) > 0:
            s |= 1 << i
    return s


def _dot(a, b):
    if a is None or b is None or len(a) != len(b):
        return None
    acc = 0.0
    for x, y in zip(a, b):
        if x is None or y is None:
            return None
        acc = acc + _f32(x) * _f32(y)
    return acc


def _cos(a, b):
    d = _dot(a, b)
    if d is None:
        return None
    den = math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b))
    if den == 0.0:
        return None  # try_divide / DuckDB x/0 → NULL
    return d / den


def _py_semantic(base_rows, tau=_TAU) -> dict:
    """base_rows: [(vec_id, embedding-or-None)] BEFORE dup injection.
    Returns {vec_id: (bucket, action, witness_id)} after the +1M
    vec_id%100==0 injection (the embeddings_dup fixture)."""
    rows = list(base_rows) + [
        (vid + 1_000_000, e) for vid, e in base_rows if vid % 100 == 0
    ]
    out = {}
    for vid, e in rows:
        b = _sig(e)
        wit = None
        for vjd, ej in rows:
            if vjd < vid and _sig(ej) == b:
                c = _cos(e, ej)
                if c is not None and c >= tau:
                    wit = vjd if wit is None else min(wit, vjd)
        out[vid] = (b, "drop" if wit is not None else "keep", wit)
    return out


def _run(spark, d: str) -> dict:
    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    return {
        r.vec_id: (r.bucket, r.action, r.witness_id)
        for r in registry.get("x_dedup_semantic").fn(spark, d).collect()
    }


def test_registered_fixture_drops_injected_dups(spark, sf_dir):
    """Every injected +1M twin is an exact duplicate of its original in
    the same bucket → it DROPS with the original (or an even earlier
    cosine-duplicate) as witness; originals with no earlier near-dup
    keep. Verdicts cover the whole dup corpus exactly once."""
    import pyarrow.parquet as pq

    n_base = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).num_rows
    got = _run(spark, sf_dir)
    injected = [v for v in got if v >= 1_000_000]
    assert len(got) == n_base + len(injected)
    assert injected, "fixture must inject dup traffic"
    for v in injected:
        b, action, wit = got[v]
        assert action == "drop"
        assert wit is not None and wit < v
        # the witness shares the bucket by construction
        assert got[wit][0] == b


def test_synthetic_replica_and_oracle(spark):
    """Hand-built corpus covering every vet-note hazard at once; engine
    == replica == oracle."""
    v = [1.0] + [0.0] * 63
    w = [0.9999] + [-0.01] + [0.0] * 62  # cos(v,w) ≈ 0.99995 ≥ τ, bucket 0b1
    x = [0.70, 0.70] + [0.0] * 62  # cos(v,x) ≈ 0.707 < τ, same bucket
    neg = [-1.0] * 8 + [0.0] * 56  # bucket 0 (all signs ≤ 0)
    rows = [
        (0, v),  # %100==0 → +1M injected exact twin must drop
        (1, w),  # drops against 0 (same bucket 0b1, cos ≥ τ)
        (2, x),  # keeps (below τ); bucket 0b11 differs from v anyway
        (3, [0.0] * 64),  # zero-norm: keeps, never witnesses
        (4, None),  # NULL embedding: bucket 0, cos NULL → keeps
        (5, [1.0] * 4),  # truncated: len mismatch → cos NULL → keeps
        (6, neg),  # bucket 0 alongside 3/4/5 — still no qualifying cos
        (7, v),  # exact dup of 0 → drops with witness 0
    ]
    d = tempfile.mkdtemp(prefix="rhds_sem18_")
    try:
        _write_embeddings(d, [e for _, e in rows])
        got = _run(spark, d)
        want = _py_semantic(rows)
        assert got == want
        assert got[1_000_000] == (got[0][0], "drop", 0)
        assert got[7] == (got[0][0], "drop", 0)
        assert got[1][1] == "drop" and got[1][2] == 0
        for vid in (2, 3, 4, 5, 6):
            assert got[vid][1] == "keep" and got[vid][2] is None
        _oracle_parity(spark, d, ("x_dedup_semantic",))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_cross_bucket_twins_do_not_pair(spark):
    """Identical direction but OPPOSITE first-dim sign → different
    buckets → no pair, both keep: the IVF prune's documented recall
    trade, pinned so a bucketing regression can't silently widen
    recall by scanning all pairs."""
    a = [1.0, 1.0] + [0.0] * 62
    b = [-1.0, 1.0] + [0.0] * 62
    # writer assigns ids 0..n-1: id 2 drops against 0; id 1 keeps alone
    # (opposite first-dim sign → different bucket despite cos symmetry)
    rows = list(enumerate([a, b, a]))
    d = tempfile.mkdtemp(prefix="rhds_sem18x_")
    try:
        _write_embeddings(d, [e for _, e in rows])
        got = _run(spark, d)
        assert got == _py_semantic(rows)
        assert got[0][1] == "keep"
        assert got[1][1] == "keep"
        assert got[2] == (got[0][0], "drop", 0)
        assert got[1][0] != got[0][0]
        _oracle_parity(spark, d, ("x_dedup_semantic",))
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# property fuzz: random small corpora from a float32-exact value pool
# (dyadic rationals — no storage quantization drift), including NULL/short/
# zero vectors and deliberate duplicates; engine == oracle == replica
# ---------------------------------------------------------------------------

_VEC = st.one_of(
    st.none(),
    st.lists(
        st.sampled_from([0.0, 0.5, -0.5, 1.0, -1.0, 0.25, 2.0]),
        min_size=0,
        max_size=12,
    ),
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=st.lists(_VEC, min_size=1, max_size=12))
def test_semantic_matches_oracle_and_replica_fuzz(spark, vecs):
    rows = list(enumerate(vecs))
    d = tempfile.mkdtemp(prefix="rhds_sem18f_")
    try:
        _write_embeddings(d, vecs)
        got = _run(spark, d)
        assert got == _py_semantic(rows)
        _oracle_parity(spark, d, ("x_dedup_semantic",))
    finally:
        shutil.rmtree(d, ignore_errors=True)
