"""Round-18 x_sim_recall pins (SURVEY §7.14 r19-queue vet note, built
same-round per the r15/r17 late-vet precedent).

ANN recall calibration — the embedding twin of x_minhash_jaccard_est:
for the deterministic query sample (vec_id % 100 == 1), the EXACT cosine
top-10 over the whole corpus vs the IVF top-10 (bucket-restricted via
the shared ivf_sig), per query: (qid, n_exact, n_ivf, n_hit,
recall_at_10 = n_hit / 10.0 as a RAW double — the repo-wide
small-int-ratio convention).

Replica-first discipline: :func:`_py_recall` recomputes the whole report
in pure Python (float32 quantization, exact-fold cosines, the
(cos DESC, vec_id ASC) total rank order, set intersection) outside both
engines.

Pinned hazards from the vet note:

- rank-10 tie boundary: cosine ties break by vec_id on every engine and
  in the replica (bit-identical cosines make the sort key total);
- sub-10 lists: a corpus smaller than 11 yields n_exact < 10; counts
  are true sizes and recall stays denominated by the constant k=10;
- the IVF recall miss is REAL and measurable: a neighbor outside the
  query's sign bucket appears in the exact list but not the IVF list;
- NULL / zero-norm / length-mismatched vectors fall out of both lists
  identically (NULL-cosine conventions + the equal-length oracle guard);
- the query's self-row is excluded from both lists.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .test_round10_properties import _oracle_parity
from .test_round13_emb_hostile_properties import _write_embeddings
from .test_round18_semantic import _cos, _sig

_K = 10


def _py_recall(rows) -> dict:
    """rows: [(vec_id, embedding-or-None)]. Returns
    {qid: (n_exact, n_ivf, n_hit, recall_at_10)}."""
    out = {}
    for qid, qe in rows:
        if qid % 100 != 1:
            continue
        qb = _sig(qe)
        scored = []
        for vid, e in rows:
            if vid == qid:
                continue
            c = _cos(e, qe)
            if c is not None:
                scored.append((vid, _sig(e), c))
        rank = sorted(scored, key=lambda t: (-t[2], t[0]))
        exact = [vid for vid, _b, _c in rank[:_K]]
        ivf_rank = [t for t in rank if t[1] == qb]
        ivf = [vid for vid, _b, _c in ivf_rank[:_K]]
        n_hit = len(set(exact) & set(ivf))
        out[qid] = (len(exact), len(ivf), n_hit, n_hit / 10.0)
    return out


def _run(spark, d: str) -> dict:
    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    return {
        r.qid: (r.n_exact, r.n_ivf, r.n_hit, r.recall_at_10)
        for r in registry.get("x_sim_recall").fn(spark, d).collect()
    }


def test_registered_fixture_matches_replica(spark, sf_dir):
    """Engine == replica on the real fixture; every sampled query
    reports, lists are k-sized on a 500-vector corpus, and the IVF
    recall is sane (hits ≤ both list sizes)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    rows = list(
        zip(
            t.column("vec_id").to_pylist(),
            t.column("embedding").to_pylist(),
        )
    )
    got = _run(spark, sf_dir)
    want = _py_recall(rows)
    assert got == want
    assert got, "sample must be non-empty at every sf"
    for n_exact, n_ivf, n_hit, rec in got.values():
        assert n_exact == _K  # corpus >> k
        assert n_hit <= min(n_exact, n_ivf)
        assert rec == n_hit / 10.0


def test_synthetic_recall_miss_and_tie_break(spark):
    """Hand-built corpus: one scoreable neighbor lives in the OPPOSITE
    sign bucket (the exact list includes it, the IVF list cannot — a
    real measured recall miss), plus exact cosine ties broken by
    vec_id (three scaled twins of one direction — dyadic scaling makes
    their cosines bit-identical), a zero-norm vector, a NULL, and a
    truncated vector."""
    q = [1.0, 0.0] + [0.0] * 62  # qid must be ≡ 1 (mod 100): id 1
    near_other_bucket = [-0.001, 1.0] + [0.0] * 62  # bit0 unset: bucket differs
    same_a = [1.0, -0.5] + [0.0] * 62  # same bucket as q (bit0 only)
    same_b = [2.0, -1.0] + [0.0] * 62  # scaled twin of same_a: exact tie
    vecs = [
        [0.5, -0.25] + [0.0] * 62,  # id 0: same bucket, ties with 2/3
        q,  # id 1: the query
        same_a,  # id 2
        same_b,  # id 3
        near_other_bucket,  # id 4: cos≈0 to q but other bucket anyway
        [0.0] * 64,  # id 5: zero-norm → excluded everywhere
        None,  # id 6: NULL → excluded
        [1.0] * 4,  # id 7: length mismatch vs q → excluded
    ]
    rows = list(enumerate(vecs))
    d = tempfile.mkdtemp(prefix="rhds_rec18_")
    try:
        _write_embeddings(d, vecs)
        got = _run(spark, d)
        want = _py_recall(rows)
        assert got == want
        (entry,) = got.values()
        n_exact, n_ivf, n_hit, rec = entry
        # exact list: ids 0,2,3,4 (4 scoreable neighbors); ivf list:
        # only same-bucket ids 0,2,3 → the id-4 neighbor is the miss
        assert (n_exact, n_ivf, n_hit) == (4, 3, 3)
        assert rec == 0.3
        _oracle_parity(spark, d, ("x_sim_recall",))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_tiny_corpus_sub_k_lists(spark):
    """A 2-vector corpus: one query, one neighbor — n_exact = n_ivf = 1,
    recall still denominated by k=10 (0.1), per the vet note."""
    v = [1.0] + [0.0] * 63
    vecs = [v, v]  # ids 0 and 1; qid 1 sees neighbor 0 at cos 1.0
    d = tempfile.mkdtemp(prefix="rhds_rec18t_")
    try:
        _write_embeddings(d, vecs)
        got = _run(spark, d)
        assert got == _py_recall(list(enumerate(vecs)))
        assert got == {1: (1, 1, 1, 0.1)}
        _oracle_parity(spark, d, ("x_sim_recall",))
    finally:
        shutil.rmtree(d, ignore_errors=True)


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
@given(vecs=st.lists(_VEC, min_size=2, max_size=12))
def test_recall_matches_oracle_and_replica_fuzz(spark, vecs):
    rows = list(enumerate(vecs))
    d = tempfile.mkdtemp(prefix="rhds_rec18f_")
    try:
        _write_embeddings(d, vecs)
        got = _run(spark, d)
        assert got == _py_recall(rows)
        _oracle_parity(spark, d, ("x_sim_recall",))
    finally:
        shutil.rmtree(d, ignore_errors=True)
