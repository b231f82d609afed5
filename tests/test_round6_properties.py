"""Semantic invariants for the round-6 operators — properties the DuckDB
oracle parity cannot express (a shared bug would pass parity; these pin the
meaning). Style per test_pipeline_properties.py.
"""

from __future__ import annotations

import numpy as np

from reconciliation_hive_data_spark.operators.aggregates import agg_bitmap
from reconciliation_hive_data_spark.plans.corpus_ops import (
    _KNN_K,
    _OUTLIER_MIN_GROUP,
    _OUTLIER_Z,
    _PMI_MIN_PAIR,
    _PMI_TOP,
    x_doc_outliers,
    x_knn_graph,
    x_token_pmi,
)
from reconciliation_hive_data_spark.plans.sketches import _KMV_K, sketch_kmv


def test_bitmap_distinct_equals_exact_everywhere(spark, sf_dir):
    """The bitmap popcount IS an exact algorithm — every group must MATCH
    its COUNT(DISTINCT) twin, not just hash-match the oracle."""
    rows = agg_bitmap(spark, sf_dir).collect()
    assert rows, "orders always has at least one status group"
    for r in rows:
        assert r.bitmap_distinct == r.exact_distinct
        assert r.verdict == "MATCH"


def test_kmv_estimates_track_exact_cardinalities(spark, sf_dir):
    """KMV with k=64 has ~1/sqrt(k-2) ≈ 13% relative error; on the
    deterministic fixture hashes the estimates must land within 50% of
    exact for both sets and the union, and the sketch must be full."""
    r = sketch_kmv(spark, sf_dir).collect()[0]
    assert r.k == _KMV_K
    for est, exact in (
        (r.est_a, r.exact_a),
        (r.est_b, r.exact_b),
    ):
        assert exact > 0 and est > 0
        assert abs(est - exact) / exact < 0.5, (est, exact)
    # inclusion-exclusion identity holds by construction
    assert abs(r.est_inter - (r.est_a + r.est_b - r.est_union)) < 1e-9
    # fixture customer sets overlap heavily: the estimate must see it
    assert r.exact_inter > 0
    assert r.est_inter > 0


def test_knn_graph_is_a_wellformed_topk_graph(spark, sf_dir):
    """Per-src: no self edges, ranks are exactly 1..k (labels have > k
    members at every sf), neighbors distinct, cosine non-increasing in
    rank and <= 1 + eps."""
    rows = x_knn_graph(spark, sf_dir).collect()
    assert rows
    by_src: dict[int, list] = {}
    for r in rows:
        assert r.src_id != r.nbr_id
        assert r.cos_sim <= 1.0 + 1e-9
        by_src.setdefault(r.src_id, []).append(r)
    for src, edges in by_src.items():
        edges.sort(key=lambda r: r.rn)
        assert [r.rn for r in edges] == list(range(1, _KNN_K + 1)), src
        assert len({r.nbr_id for r in edges}) == _KNN_K
        sims = [r.cos_sim for r in edges]
        assert all(a >= b for a, b in zip(sims, sims[1:]))


def test_pmi_output_is_thresholded_and_ranked(spark, sf_dir):
    rows = x_token_pmi(spark, sf_dir).collect()
    assert 0 < len(rows) <= _PMI_TOP
    assert all(r.pair_n >= _PMI_MIN_PAIR for r in rows)
    assert all(r.lift > 0 for r in rows)
    lifts = [r.lift for r in rows]
    # orderBy desc before limit: output arrives rank-ordered on lift
    assert all(a >= b for a, b in zip(lifts, lifts[1:]))


def test_doc_outliers_match_numpy_recompute(spark, sf_dir):
    """Independent recompute of the flagged set with numpy (different
    summation order, different codebase) — set equality, not just parity.
    Docs whose |z| lands inside a symmetric ±eps band around the threshold
    are excluded from the comparison on BOTH sides: there the two
    codebases' floating-point rounding can legitimately disagree about
    >= _OUTLIER_Z, and a one-sided widening would only ever enlarge the
    expected set, failing spuriously when Spark's bit-exact z falls just
    under the cut."""
    from reconciliation_hive_data_spark.catalog import load

    docs = (
        load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars").toPandas()
    )
    eps = 1e-9
    expected, borderline = set(), set()
    for lang, g in docs.groupby("lang"):
        if len(g) < _OUTLIER_MIN_GROUP:
            continue
        x = g["n_chars"].to_numpy(dtype=np.float64)
        mu = x.mean()
        sigma = x.std(ddof=1)
        z = np.abs((x - mu) / sigma)
        ids = g["doc_id"].to_numpy()
        near = np.abs(z - _OUTLIER_Z) < eps
        borderline |= set(ids[near])
        expected |= set(ids[(z >= _OUTLIER_Z) & ~near])
    got = {r.doc_id for r in x_doc_outliers(spark, sf_dir).collect()}
    assert got - borderline == expected
