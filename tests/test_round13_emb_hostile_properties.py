"""Round-13 hostile-component fuzz for the embeddings family — extends the
r12 degenerate-vector campaign (zero-norm, dup/near-dup, bucket edges) with
the corrupt-VALUE classes it left out, split into the two r12 scalar-fn
domains:

1. **Oracle-parity domain** — in-contract SHAPE (dim 64, like the fixture)
   but hostile component values: NaN, ±Inf, a float32-denormal, -0.0, and
   a 1e30 magnitude. Both engines promote the same float32 bits to double
   and fold in the same order (dot/duck_dot are op-order twins), both
   treat NaN as greater than every number in comparisons and sorts, and
   both follow IEEE for Inf arithmetic — so exact parity is the contract.

2. **Robustness domain** — out-of-contract shapes a corrupt 100 TB ingest
   really produces: NULL embedding, empty list, truncated (dim-4) vector,
   and a NULL component inside the array. The DuckDB oracle is allowed to
   error or diverge here (list_reduce errors on empty lists; its
   range(len(a)) dot silently computes a PARTIAL dot for mismatched dims,
   where Spark's zip_with pads with NULL and yields NULL — NULL, i.e.
   "incomparable", is the behavior we actually want for a truncated
   vector, so the engine side is the contract and the assertion is
   completion: one corrupt row must degrade to NULL in that row's
   outputs, never abort the job or poison other rows' results.

The MLlib LSH twins stay out of both domains: MLlib requires finite,
fixed-dim vectors by contract, and the twins are rows-only demonstrations
of API parity, not the scale path.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .test_round10_properties import _oracle_parity
from .test_round12_properties import _EMB_QUERIES, _mk_vec

_DIM = 64

#: hostile-but-agreed component values (float32-representable; both
#: engines read identical bits and promote identically)
_NASTY_COMPONENTS = [
    float("nan"),
    float("inf"),
    float("-inf"),
    1e30,
    -0.0,
    1e-40,  # float32 denormal; exact in the f32->f64 promotion
]

_HOSTILE_KINDS = tuple(f"nasty{i}" for i in range(len(_NASTY_COMPONENTS)))


def _mk_hostile_vec(kind: str):
    """In-contract shape, hostile value: e0 plus one nasty component."""
    if kind.startswith("nasty"):
        v = [0.0] * _DIM
        v[0] = 1.0
        v[1] = _NASTY_COMPONENTS[int(kind[len("nasty"):])]
        return v
    return _mk_vec(kind)  # reuse the r12 degenerate shapes for density


_SPECS = st.lists(
    st.tuples(
        st.sampled_from(
            _HOSTILE_KINDS + ("zero", "e0", "e1", "neg_e0", "scaled_e0")
        ),
        st.integers(min_value=0, max_value=9),  # label
    ),
    min_size=1,
    max_size=12,
)


def _write_embeddings(d: str, vecs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(
                    [i % 3 for i in range(len(vecs))], pa.int32()
                ),
            }
        ),
        f"{d}/embeddings.parquet",
    )


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(specs=_SPECS)
def test_embedding_family_matches_oracle_on_nasty_components(spark, specs):
    """All seven engine-native embeddings queries vs their oracles on
    corpora whose vectors carry NaN / ±Inf / -0.0 / denormal / 1e30
    components in the contracted dim-64 shape."""
    d = tempfile.mkdtemp(prefix="rhds_emb_nasty_")
    try:
        _write_embeddings(d, [_mk_hostile_vec(k) for k, _ in specs])
        _oracle_parity(spark, d, _EMB_QUERIES)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# -- robustness: Spark completes on out-of-contract shapes -------------------

_BROKEN_CORPUS = [
    [1.0] + [0.0] * (_DIM - 1),          # sane anchor (vec_id 0 = probe)
    None,                                # NULL embedding
    [],                                  # empty list
    [1.0, 2.0, 3.0, 4.0],                # truncated: dim 4
    [None, 1.0] + [0.0] * (_DIM - 2),    # NULL component inside
    [float("nan")] * _DIM,               # all-NaN
    [0.5] * _DIM,                        # second sane row (pairs exist)
    [0.5] * _DIM,                        # exact dup of it
]


def test_embedding_family_never_aborts_on_broken_vectors(spark):
    """The no-crash contract for the similarity path: NULL / empty /
    truncated / NULL-component / all-NaN vectors may NULL out their own
    rows but must never abort a query or fail another row's result."""
    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    d = tempfile.mkdtemp(prefix="rhds_emb_broken_")
    try:
        _write_embeddings(d, _BROKEN_CORPUS)
        failures = []
        for name in _EMB_QUERIES:
            try:
                registry.get(name).fn(spark, d).count()
            except Exception as e:  # noqa: BLE001 — the assertion IS "no abort"
                failures.append(f"{name}: {type(e).__name__}: {str(e)[:160]}")
        assert not failures, failures
    finally:
        shutil.rmtree(d, ignore_errors=True)


# -- pinned signed-zero fork (r15 full-suite hypothesis find) ----------------


def test_tiny_negative_cosine_rounds_without_signed_zero(spark):
    """Pinned falsifying corpus: probe = nasty3 ([1, 1e30, 0...]) against
    neg_e0 gives cos ≈ -1e-30 — DuckDB's ROUND kept the sign (-0.0) while
    Spark's BigDecimal round has no signed zero (+0.0). Every rounded
    cosine emission now appends + 0.0 in the oracle (canonical.py hazard
    #4); this replay keeps the class closed without hypothesis luck."""
    d = tempfile.mkdtemp(prefix="rhds_emb_negzero_")
    try:
        _write_embeddings(
            d, [_mk_hostile_vec("nasty3"), _mk_hostile_vec("neg_e0")]
        )
        _oracle_parity(spark, d, _EMB_QUERIES)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_zero_vector_against_negative_dot_sign(spark):
    """The sibling raw-emission class: a zero vector dotted with a
    negative one folds all-(-0.0) products — DuckDB's seedless
    list_reduce summed them to -0.0 while Spark's 0.0-seeded F.aggregate
    yields +0.0. duck_dot now prepends the same 0.0 seed; x_knn_graph
    (raw cos_sim, no ROUND) is the visible surface."""
    d = tempfile.mkdtemp(prefix="rhds_emb_zeroneg_")
    try:
        # probe (vec 0) zero; vec 1 negative; same label block via i%3
        # cycle needs three rows — vec 3 pairs with vec 0 (label 0)
        _write_embeddings(
            d,
            [
                _mk_hostile_vec("zero"),
                _mk_hostile_vec("neg_e0"),
                _mk_hostile_vec("e1"),
                [-1.0] * _DIM,
            ],
        )
        _oracle_parity(spark, d, _EMB_QUERIES)
    finally:
        shutil.rmtree(d, ignore_errors=True)
