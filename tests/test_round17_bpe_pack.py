"""Round-17 battery for x_bpe_pack — sequence packing on POST-BPE token
counts (SURVEY §7.12 candidate 2).

The load-bearing piece is the INDEPENDENT-EXPECTATION replica (the r16
lesson, SURVEY §7.12 outcome log: cross-engine parity cannot see a
semantic written identically into both engines — recon_remediate's
inverted insert/delete arm passed parity): `_py_bpe_pack` re-implements
the whole chain — extract-then-lower tokenizer, _BPE_N greedy merge
rounds with the (cnt DESC, s1 ASC, s2 ASC) marker-space election,
per-doc post-merge token counts, md5-shard cumsum packing — in pure
Python with no Spark/DuckDB machinery, and both a pinned corpus and a
hypothesis fuzz assert the Spark plan reproduces it row for row.

Boundary pins from the r16 DuckDB vet probe (SURVEY §7.12 candidate 2):
zero-word and NULL-text docs survive the left-join/COALESCE-0 path and
appear in packing; a 0-token doc whose running total sits exactly ON a
cap boundary is assigned to the NEXT sequence (cum=4, cap 4 → seq 1).
Spark↔DuckDB parity itself rides the r13 hostile-documents family sweep
(test_round13_docs_hostile_properties._ALL_DOCS_QUERIES) plus the direct
pinned-corpus parity test here.
"""

from __future__ import annotations

import pytest
import hashlib
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings

from reconciliation_hive_data_spark.plans.corpus_ops import (
    _BPE_N,
    _BPE_PACK_CAP,
    bpe_pack_plan,
)

from .test_round10_properties import _oracle_parity
from .test_round13_docs_hostile_properties import (
    _DOCS,
    _PINNED,
    _write_documents_nullable,
)

# -- pure-Python replica (no Spark, no DuckDB) --------------------------------


def _py_tokens(text) -> list[str]:
    """The engine tokenizer: [a-zA-Z]+ runs of the RAW text, lowered
    AFTER extraction (the r15 'İ' rule)."""
    if text is None:
        return []
    return [w.lower() for w in re.findall(r"[a-zA-Z]+", text)]


def _py_toklens(word_counts: Counter) -> dict[str, int]:
    """_BPE_N greedy merge rounds over the word-frequency table; returns
    each ORIGINAL word's post-merge symbol count (its marker-form length).

    Mirrors the engine semantics exactly: the m{k} tables never re-group
    collapsed marker forms (one row per original-vocab word, each
    carrying its own wc), pair counts skip single-symbol words, the
    election orders (cnt DESC, s1 ASC, s2 ASC) over marker-space chars
    (code-point order == both engines' binary collation over
    [a-z] + chr(1.._BPE_N)), a pairless round is the identity, and the
    merge is a greedy left-to-right non-overlapping replace (Python
    str.replace == Spark/DuckDB replace)."""
    form = {w: w for w in word_counts}
    for k in range(1, _BPE_N + 1):
        pairs: Counter = Counter()
        for w, cur in form.items():
            c = word_counts[w]
            for i in range(len(cur) - 1):
                pairs[(cur[i], cur[i + 1])] += c
        if not pairs:
            continue
        (s1, s2), _cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        pair = s1 + s2
        form = {w: cur.replace(pair, chr(k)) for w, cur in form.items()}
    return {w: len(cur) for w, cur in form.items()}


def _py_shard(doc_id: int) -> int:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:4], 16) % 16


def _py_bpe_pack(docs, cap: int) -> dict[tuple, tuple[int, int]]:
    """(doc_id, text, lang, *rest) rows → {(lang, shard_id, seq_id):
    (n_docs, seq_tokens)} — the full independent expectation."""
    word_counts: Counter = Counter()
    doc_toks: dict[int, list[str]] = {}
    for row in docs:
        doc_id, text, lang = row[0], row[1], row[2]
        toks = _py_tokens(text)
        doc_toks[doc_id] = toks
        word_counts.update(toks)
    toklen = _py_toklens(word_counts)
    per_doc = []
    for row in docs:
        doc_id, lang = row[0], row[2]
        n_tok = sum(toklen[w] for w in doc_toks[doc_id])
        per_doc.append((lang, _py_shard(doc_id), doc_id, n_tok))
    out: dict[tuple, list[int]] = {}
    groups: dict[tuple, list] = {}
    for lang, shard, doc_id, n_tok in per_doc:
        groups.setdefault((lang, shard), []).append((doc_id, n_tok))
    for (lang, shard), rows in groups.items():
        cum = 0
        for doc_id, n_tok in sorted(rows):
            cum += n_tok
            seq = (cum - n_tok) // cap
            acc = out.setdefault((lang, shard, seq), [0, 0])
            acc[0] += 1
            acc[1] += n_tok
    return {k: (v[0], v[1]) for k, v in out.items()}


def _spark_pack(spark, docs, cap: int) -> dict[tuple, tuple[int, int]]:
    df = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in docs],
        "doc_id bigint, text string, lang string",
    )
    rows = bpe_pack_plan(df, cap=cap).collect()
    return {
        (r["lang"], r["shard_id"], r["seq_id"]): (r["n_docs"], r["seq_tokens"])
        for r in rows
    }


# -- pinned corpus: every interesting shape, default cap ----------------------

_REPLICA_PINNED = [
    (0, None, None, None),                     # NULL text → 0 tokens
    (1, "", "en", None),                       # empty text → 0 tokens
    (2, "123 456 ... !!!", "en", None),        # words but no [a-zA-Z]
    (3, "the theory of everything", "en", None),
    (4, "the the the theory", "en", None),     # dense dup space
    (5, "aaaa aaaa bbbb", "en", None),         # self-overlapping merges
    (6, "héllo naïve the", "es", None),        # multibyte: ASCII runs only
    (7, "x" * 64, "es", None),                 # one long token
    (8, "the theory " * 50, "en", None),       # enough to cross 2048? no —
    (9, "word " * 300, "en", None),            # but exercises larger cums
    (-1, "the end", "zh", None),               # negative doc_id shard
    (2**40, "the end", "zh", None),            # 40-bit doc_id shard
]


def test_bpe_pack_matches_python_replica_on_pinned_corpus(spark):
    got = _spark_pack(spark, _REPLICA_PINNED, _BPE_PACK_CAP)
    want = _py_bpe_pack(_REPLICA_PINNED, _BPE_PACK_CAP)
    assert got == want
    # the zero-token docs (0, 1, 2) are PRESENT in the packing
    assert sum(n for n, _t in want.values()) == len(_REPLICA_PINNED)


def test_bpe_pack_matches_python_replica_small_cap(spark):
    """cap=4 forces many sequence boundaries through the same corpus."""
    got = _spark_pack(spark, _REPLICA_PINNED, 4)
    want = _py_bpe_pack(_REPLICA_PINNED, 4)
    assert got == want
    # docs are never SPLIT (whole-doc binning by start offset), so a
    # lone doc in its shard packs at seq 0 regardless of cap — the
    # boundary effects need co-sharded docs, pinned in the test below.


# -- the r16 probe pin: 0-token doc exactly ON a boundary → NEXT sequence ----


def _ids_sharing_shard(n: int, start: int = 0) -> list[int]:
    """First n doc_ids (from start) that share doc 'start's shard —
    guarantees one (lang, shard) window group in ascending id order."""
    target = _py_shard(start)
    out, i = [], start
    while len(out) < n:
        if _py_shard(i) == target:
            out.append(i)
        i += 1
    return out


def test_bpe_pack_zero_token_doc_on_boundary_goes_to_next_seq(spark):
    """Single-letter words produce NO pairs → all rounds are the identity
    → every token has length 1, so n_tok is just the word count. Doc A
    lands cum exactly ON cap=4; the following 0-token docs must open the
    NEXT sequence (floor(cum/cap) with n_tok=0 — the r16 DuckDB probe
    pin), not close the full one."""
    a, b, c = _ids_sharing_shard(3)
    docs = [
        (a, "a b c d", "en", None),   # 4 one-letter tokens → cum = 4
        (b, "123", "en", None),       # 0 tokens, cum = 4 → seq 1
        (c, None, "en", None),        # 0 tokens, cum = 4 → seq 1
    ]
    got = _spark_pack(spark, docs, 4)
    shard = _py_shard(a)
    assert got == {
        ("en", shard, 0): (1, 4),
        ("en", shard, 1): (2, 0),
    }
    assert got == _py_bpe_pack(docs, 4)


# -- hypothesis fuzz: replica equality on the hostile-docs corpus zoo ---------


@pytest.mark.soak
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_DOCS)
def test_bpe_pack_matches_python_replica_fuzz(spark, docs):
    cap = 4 if len(docs) % 2 else _BPE_PACK_CAP
    assert _spark_pack(spark, docs, cap) == _py_bpe_pack(docs, cap)


# -- direct oracle parity on the pinned hostile corpus (family also sweeps) --


def test_bpe_pack_oracle_parity_on_pinned_hostile_corpus(spark, tmp_path):
    d = str(tmp_path)
    _write_documents_nullable(spark, d, _PINNED)
    _oracle_parity(spark, d, ("x_bpe_pack",))
