"""Round-17 battery for x_dedup_drop_list — the write-ready keep/drop
list from duplicate clusters (SURVEY §7.13 candidate 2).

Independent-expectation replica (the r16/r17 rule): `_py_drop_list`
recomputes the whole expected list in pure Python — the documents3
version expansion (+1M/+2M per %50 doc, +3M/+4M/+5M per %250 doc),
text-equality grouping (a chain over consecutive versions of identical
md5 IS the text-equality component, NULL texts grouping together like
NULL md5 window partitions), min-id survivor election — with no
Spark/DuckDB machinery. Tests assert row-for-row equality on a pinned
corpus and under hypothesis fuzz, plus the structural invariants
(exactly one keep per cluster; the keep IS the cluster id; sizes add
up). Spark↔DuckDB parity rides the r13 hostile-documents family sweep
plus a direct pinned parity check here.
"""

from __future__ import annotations

import pytest
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings

from .test_round10_properties import _oracle_parity
from .test_round13_docs_hostile_properties import (
    _DOCS,
    _PINNED,
    _write_documents_nullable,
)

# -- pure-Python replica ------------------------------------------------------


def _py_drop_list(docs) -> dict:
    """(doc_id, text, *rest) rows → {doc_id: (cluster_id, cluster_size,
    action)} for every clustered doc (text-equality groups of size >= 2
    over the documents3 version expansion)."""
    d3 = []
    for row in docs:
        i, t = row[0], row[1]
        d3.append((i, t))
        if i % 50 == 0:
            d3 += [(i + 1_000_000, t), (i + 2_000_000, t)]
        if i % 250 == 0:
            d3 += [(i + 3_000_000, t), (i + 4_000_000, t), (i + 5_000_000, t)]
    groups: dict = {}
    for i, t in d3:
        groups.setdefault(t, []).append(i)
    out = {}
    for ids in groups.values():
        if len(ids) < 2:
            continue
        m = min(ids)
        for i in ids:
            out[i] = (m, len(ids), "keep" if i == m else "drop")
    return out


def _run(spark, docs) -> dict:
    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    d = tempfile.mkdtemp(prefix="rhds_drop17_")
    try:
        _write_documents_nullable(spark, d, docs)
        rows = registry.get("x_dedup_drop_list").fn(spark, d).collect()
        got = {
            r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["action"])
            for r in rows
        }
        assert len(got) == len(rows), "duplicate doc_id rows in drop list"
        return got
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _check_invariants(got: dict) -> None:
    clusters: dict = {}
    for doc_id, (cid, size, action) in got.items():
        clusters.setdefault(cid, []).append((doc_id, size, action))
    for cid, members in clusters.items():
        keeps = [d for d, _s, a in members if a == "keep"]
        assert keeps == [cid], f"cluster {cid}: keeps={keeps}"
        assert cid == min(d for d, _s, _a in members)
        assert all(s == len(members) for _d, s, _a in members)
        assert len(members) >= 2


def test_drop_list_matches_python_replica_on_pinned_corpus(spark):
    got = _run(spark, _PINNED)
    assert got == _py_drop_list(_PINNED)
    _check_invariants(got)
    # the pinned corpus has a genuine exact-dup pair (docs 5 and 6) plus
    # the %50/%250 version chains off doc 0 — both shapes must be present
    assert got[6] == (5, 2, "drop") and got[5] == (5, 2, "keep")
    assert got[0][2] == "keep" and got[1_000_000 + 0][2] == "drop"


def test_drop_list_oracle_parity_on_pinned_corpus(spark, tmp_path):
    d = str(tmp_path)
    _write_documents_nullable(spark, d, _PINNED)
    _oracle_parity(spark, d, ("x_dedup_drop_list",))


@pytest.mark.soak
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_DOCS)
def test_drop_list_matches_python_replica_fuzz(spark, docs):
    got = _run(spark, docs)
    assert got == _py_drop_list(docs)
    _check_invariants(got)
