"""Round-9 property tests: x_attribution conservation/determinism and
scan_partition_pruned artifact behavior — the invariants the oracle hash
can't state directly (it proves equality with DuckDB, not that attribution
conserves sessions and value, or that the partitioned layout is reused
rather than rebuilt)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reconciliation_hive_data_spark.plans.pipeline_ops import (
    win_sessionize,
    x_attribution,
)
from reconciliation_hive_data_spark.sources.files import scan_partition_pruned


def test_attribution_conserves_sessions(spark, sf_dir):
    """Every session is credited exactly once per touch type, so the
    first-touch and last-touch session totals must each equal the
    sessionizer's session count (same gap rule, same data)."""
    n_sessions = win_sessionize(spark, sf_dir).count()
    tot = (
        x_attribution(spark, sf_dir)
        .agg(
            F.sum("first_touch_sessions").alias("f"),
            F.sum("last_touch_sessions").alias("l"),
        )
        .first()
    )
    assert tot.f == n_sessions and tot.l == n_sessions


def test_attribution_conserves_value(spark, sf_dir):
    """Each touch type distributes the SAME total (the sum of all event
    values) across sources — attribution reassigns credit, never creates
    or destroys it. Sums are exact-decimal underneath; the final
    double-add across ≤5 sources tolerates only float formatting noise."""
    from reconciliation_hive_data_spark.catalog import load

    total = (
        load(spark, sf_dir, "events")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"))
        .first()
        .v
    )
    tot = (
        x_attribution(spark, sf_dir)
        .agg(
            F.sum("first_touch_value").alias("f"),
            F.sum("last_touch_value").alias("l"),
        )
        .first()
    )
    assert abs(tot.f - total) < 1e-6 and abs(tot.l - total) < 1e-6


def test_attribution_partition_invariant(spark, sf_dir):
    """Credit assignment depends only on the (ts, event_id) total order,
    never on physical layout: a repartitioned input must produce the
    bit-identical report (doubles included — the sums are exact decimal
    underneath, so no ordering effect may surface)."""
    from reconciliation_hive_data_spark.catalog import load
    from reconciliation_hive_data_spark.plans.pipeline_ops import attribution_report

    ev = load(spark, sf_dir, "events")
    base = sorted(map(tuple, attribution_report(ev).collect()))
    shuffled = sorted(map(tuple, attribution_report(ev.repartition(13)).collect()))
    assert base == shuffled


def test_scan_partition_pruned_artifact_is_reused(spark, sf_dir):
    """Second invocation must NOT rebuild the partitioned layout (the
    fingerprint matches) — the ingest-once contract the query's 100 TB
    story rests on."""
    from reconciliation_hive_data_spark.artifacts import ensure_artifact

    scan_partition_pruned(spark, sf_dir)  # builds or reuses

    calls: list[bool] = []
    real = ensure_artifact

    def spy(*a, **k):
        loc, rebuilt = real(*a, **k)
        calls.append(rebuilt)
        return loc, rebuilt

    import reconciliation_hive_data_spark.sources.files as files_mod

    orig = files_mod.ensure_artifact
    files_mod.ensure_artifact = spy
    try:
        scan_partition_pruned(spark, sf_dir)
    finally:
        files_mod.ensure_artifact = orig
    assert calls == [False]


# ---------------------------------------------------------------------------
# differential fuzz: attribution_report vs a pure-Python reference
# ---------------------------------------------------------------------------

from collections import defaultdict  # noqa: E402

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _ref_attribution(rows):
    """Reference first/last-touch attribution: sessionize each user's
    (ts, event_id)-sorted events on the >1800 s gap rule, credit each
    session's value sum once to its first and once to its last type.
    Values are small ints, so float arithmetic is exact."""
    by_user = defaultdict(list)
    for r in rows:
        by_user[r[0]].append(r)
    out = defaultdict(lambda: [0, 0, 0.0, 0.0])  # src -> [fc, lc, fv, lv]
    for rs in by_user.values():
        rs.sort(key=lambda r: (r[1], r[2]))
        sessions, prev = [], None
        for r in rs:
            if prev is None or r[1] - prev > 1800:
                sessions.append([])
            sessions[-1].append(r)
            prev = r[1]
        for s in sessions:
            sv = float(sum(r[4] for r in s))
            out[s[0][3]][0] += 1
            out[s[0][3]][2] += sv
            out[s[-1][3]][1] += 1
            out[s[-1][3]][3] += sv
    return {
        src: (fc, lc, fv if fc else None, lv if lc else None)
        for src, (fc, lc, fv, lv) in out.items()
    }


_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user_id
        st.one_of(  # ts seconds: bias draws onto exact gap boundaries
            st.integers(min_value=0, max_value=10_000),
            st.sampled_from([0, 1799, 1800, 1801, 3600, 3601, 5400, 5401]),
        ),
        st.sampled_from(["click", "view", "buy"]),  # event_type
        st.integers(min_value=0, max_value=9),  # value (exact in double)
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_EVENTS)
def test_attribution_matches_python_reference(spark, events):
    """The operator must agree with the reference on arbitrary event sets,
    including ties on ts (event_id breaks them), gaps of exactly 1800 s
    (same session — the rule is strictly-greater), and single-event
    sessions (first == last)."""
    from reconciliation_hive_data_spark.plans.pipeline_ops import attribution_report

    rows = [
        (u, sec, i, etype, float(val))
        for i, (u, sec, etype, val) in enumerate(events)
    ]
    df = spark.createDataFrame(
        [(u, sec, eid, etype, val) for u, sec, eid, etype, val in rows],
        "user_id bigint, sec bigint, event_id bigint, event_type string, value double",
    ).select(
        "user_id",
        F.timestamp_seconds("sec").alias("ts"),
        "event_id",
        "event_type",
        "value",
    )
    got = {
        r.source: (
            r.first_touch_sessions,
            r.last_touch_sessions,
            r.first_touch_value,
            r.last_touch_value,
        )
        for r in attribution_report(df).collect()
    }
    assert got == _ref_attribution(rows)


# ---------------------------------------------------------------------------
# random-topology fuzz: connected_components vs a union-find reference
# ---------------------------------------------------------------------------


def _ref_components(edge_list):
    """Union-find reference: node -> component-min over edge-touched nodes."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


_EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=19),
        st.integers(min_value=0, max_value=19),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edge_list=_EDGES)
def test_connected_components_matches_union_find(spark, edge_list):
    """The min-label fixed-point loop must resolve ARBITRARY random
    topologies (cycles, stars, self-loops, duplicate edges, dense blobs) to
    exactly the union-find components — the fixture only ever exercises
    chains, so this is the coverage that protects the pointer-jump/
    convergence logic against shape-dependent bugs."""
    from reconciliation_hive_data_spark.plans.pipeline_ops import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(a, b) for a, b in edge_list], "src bigint, dst bigint"
    )
    got = {r.doc_id: r.lbl for r in connected_components(chain).collect()}
    assert got == _ref_components(edge_list)


# ---------------------------------------------------------------------------
# differential fuzz: join_asof vs a Python reference on synthetic events
# ---------------------------------------------------------------------------


def _ref_asof(rows):
    """For each purchase: the latest strictly-earlier non-purchase event of
    the same user; ties on ts break to the largest event_id; purchases with
    no prior event are absent. rows: (user, sec, event_id, etype)."""
    out = {}
    by_user = defaultdict(list)
    for r in rows:
        by_user[r[0]].append(r)
    for u, rs in by_user.items():
        evs = [r for r in rs if r[3] != "purchase"]
        for p in (r for r in rs if r[3] == "purchase"):
            prior = [e for e in evs if e[1] < p[1]]
            if prior:
                best = max(prior, key=lambda e: (e[1], e[2]))
                out[p[2]] = (u, best[2], best[3])
    return out


_ASOF_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user_id
        st.one_of(  # ts seconds: force frequent exact-tie collisions
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=10_000),
        ),
        st.sampled_from(["purchase", "view", "click"]),
    ),
    min_size=1,
    max_size=25,
)


@pytest.mark.soak
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_ASOF_EVENTS)
def test_asof_join_matches_python_reference(spark, events):
    """join_asof's tie semantics are the subtle part — an event at EXACTLY
    the purchase's ts is outside the frame (strict <), equal-ts prior
    events resolve to the largest event_id, same-ts purchases don't
    disturb each other — and the fixture's organic timestamps rarely
    collide, so this fuzz writes synthetic events (small ts range forces
    ties) through the real parquet load path and diffs the full result
    against an independent reference."""
    import shutil
    import tempfile

    from reconciliation_hive_data_spark.operators.joins import join_asof

    rows = [(u, sec, i, etype) for i, (u, sec, etype) in enumerate(events)]
    tmp = tempfile.mkdtemp(prefix="rhds_asof_fuzz_")
    try:
        _write_events(spark, tmp, [(u, sec, eid, etype, 1.0) for u, sec, eid, etype in rows])
        got = {
            r.purchase_id: (r.user_id, r.prior_event_id, r.prior_type)
            for r in join_asof(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert got == _ref_asof(rows)


# ---------------------------------------------------------------------------
# ts-vintage probe: INT96 vs INT64-nanos vs INT64-micros routing
# ---------------------------------------------------------------------------


def test_ts_vintage_probe_routes_all_three_parquet_vintages(spark, tmp_path):
    """events.ts has shipped as INT64 µs (current fixtures), INT64
    TIMESTAMP(NANOS) (earlier fixtures — needs the nanos-as-long legacy
    read), and in the wild as Hive-era INT96 (what Spark itself writes by
    default). The probe must route ONLY the true nanos vintage to the
    legacy path — INT96 also surfaces as arrow timestamp[ns] but Spark
    reads it natively, and the legacy path breaks on it. Each vintage
    must load end-to-end with identical values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from reconciliation_hive_data_spark.catalog import events_ts_is_nanos, load

    base = [(1, 1_700_000_000, 7, "click", 1.0, "{}")]
    cols = ["event_id", "sec", "user_id", "event_type", "value", "props"]

    def arrow_write(unit: str, d: str) -> None:
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in base], pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000_000 if unit == "ns" else r[1] * 1_000_000
                     for r in base],
                    pa.timestamp(unit),
                ),
                "user_id": pa.array([r[2] for r in base], pa.int64()),
                "event_type": pa.array([r[3] for r in base]),
                "value": pa.array([r[4] for r in base], pa.float64()),
                "props": pa.array([r[5] for r in base]),
            }
        )
        pq.write_table(tbl, d)

    expect = None
    for vintage, is_nanos in (("us", False), ("ns", True), ("int96", False)):
        d = str(tmp_path / vintage)
        import os

        os.makedirs(d, exist_ok=True)
        if vintage == "int96":
            df = spark.createDataFrame(
                base, "event_id bigint, sec bigint, user_id bigint,"
                " event_type string, value double, props string"
            ).select(
                "event_id",
                F.timestamp_seconds("sec").alias("ts"),
                *cols[2:],
            )
            df.coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
        else:
            arrow_write(vintage, d + "/events.parquet")
        assert events_ts_is_nanos(d) is is_nanos, vintage
        got = [
            (r.event_id, r.ts, r.user_id) for r in load(spark, d, "events").collect()
        ]
        if expect is None:
            expect = got
        assert got == expect, vintage


# ---------------------------------------------------------------------------
# differential fuzz: x_gapfill LOCF vs a Python reference
# ---------------------------------------------------------------------------


def _write_events(spark, tmp: str, rows) -> None:
    """rows: (user, sec, event_id, etype, value) → {tmp}/events.parquet.
    Spark writes INT96 timestamps here (its default outputTimestampType),
    so these fuzz inputs also exercise the loader's Hive-era-INT96 routing
    on every example."""
    spark.createDataFrame(
        [(eid, sec, u, etype, val, "{}") for u, sec, eid, etype, val in rows],
        "event_id bigint, sec bigint, user_id bigint,"
        " event_type string, value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(1).write.mode("overwrite").parquet(tmp + "/events.parquet")


def _ref_gapfill(rows):
    """Reference: hourly purchase-value sums densified onto the full
    [min, max] hour calendar with LOCF + filled flag."""
    hours = defaultdict(float)
    for _, sec, _, etype, val in rows:
        if etype == "purchase":
            hours[sec // 3600 * 3600] += val
    if not hours:
        return []
    lo, hi = min(hours), max(hours)
    out, prev = [], None
    for h in range(lo, hi + 1, 3600):
        if h in hours:
            prev = hours[h]
            out.append((h, prev, 0))
        else:
            out.append((h, prev, 1))
    return out


_GAPFILL_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=100) # hour slot (forces gaps)
        .map(lambda h: h * 3600)
        .flatmap(
            lambda base: st.integers(min_value=base, max_value=base + 3599)
        ),
        st.sampled_from(["purchase", "view"]),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=0,
    max_size=20,
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_GAPFILL_EVENTS)
def test_gapfill_matches_python_reference(spark, events):
    """LOCF gap-fill must match the reference on random sparse series:
    holes carry the last observation forward with filled=1, measured
    buckets pass through with filled=0, the calendar spans exactly
    [min, max] purchase hours, and a series with no purchases at all is
    empty (null bounds → empty sequence), not a crash."""
    import shutil
    import tempfile

    from reconciliation_hive_data_spark.plans.scale_ops import x_gapfill

    rows = [
        (u, sec, i, etype, float(val))
        for i, (u, sec, etype, val) in enumerate(events)
    ]
    tmp = tempfile.mkdtemp(prefix="rhds_gapfill_fuzz_")
    try:
        _write_events(spark, tmp, rows)
        got = [
            (r.b, r.sum_value, r.filled)
            for r in x_gapfill(spark, tmp)
            .select(
                F.col("bucket").cast("long").alias("b"), "sum_value", "filled"
            )
            .orderBy("b")
            .collect()
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert got == _ref_gapfill(rows)


# ---------------------------------------------------------------------------
# differential fuzz: x_chunk_docs boundary rule vs a Python reference
# ---------------------------------------------------------------------------


def _ref_chunks(doc_id, text):
    import hashlib

    toks = text.split(" ")
    n = len(toks)
    starts = [s for s in range(0, n, 48) if s == 0 or s < n - 16]
    return [
        (
            doc_id,
            idx,
            s,
            min(64, n - s),
            hashlib.md5(" ".join(toks[s : s + 64]).encode()).hexdigest(),
        )
        for idx, s in enumerate(starts)
    ]


_DOC_LENS = st.one_of(
    st.integers(min_value=0, max_value=200),
    # exact stride/window/trailing-rule boundaries
    st.sampled_from([47, 48, 49, 63, 64, 65, 79, 80, 81, 111, 112, 113, 129]),
)

_DOCS = st.lists(_DOC_LENS, min_size=1, max_size=8)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lens=_DOCS)
def test_chunk_docs_matches_python_reference(spark, lens):
    """The chunking rule's subtle part is the trailing-window filter
    (drop a last window that adds < stride-overlap new tokens, EXCEPT the
    s == 0 window which always survives): fuzz documents with token counts
    pinned to the exact boundaries and diff every emitted chunk — index,
    start, token count, md5 — against an independent reference. Empty
    documents (zero tokens → [''] after split) must chunk, not vanish."""
    import shutil
    import tempfile

    from reconciliation_hive_data_spark.plans.corpus_ops import x_chunk_docs

    docs = [
        (i, " ".join(f"w{j % 7}" for j in range(ln)), "en", "src0", ln)
        for i, ln in enumerate(lens)
    ]
    tmp = tempfile.mkdtemp(prefix="rhds_chunk_fuzz_")
    try:
        spark.createDataFrame(
            docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).coalesce(1).write.mode("overwrite").parquet(tmp + "/documents.parquet")
        got = sorted(
            (r.doc_id, r.chunk_idx, r.chunk_start, r.n_tokens, r.chunk_md5)
            for r in x_chunk_docs(spark, tmp).collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    expect = sorted(c for d, t, _, _, _ in docs for c in _ref_chunks(d, t))
    assert got == expect


# ---------------------------------------------------------------------------
# differential fuzz: x_pack_sequences cumsum binning vs a Python reference
# ---------------------------------------------------------------------------


def _ref_pack(docs):
    """docs: (doc_id, lang, n_tok). Reference cumsum binning: within each
    (lang, md5-mod-16 shard) block ordered by doc_id, a doc's sequence is
    floor(cum_before / 2048); rollup per sequence."""
    import hashlib

    blocks = defaultdict(list)
    for doc_id, lang, n_tok in docs:
        shard = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 16
        blocks[(lang, shard)].append((doc_id, n_tok))
    out = {}
    for (lang, shard), ds in blocks.items():
        cum = 0
        for doc_id, n_tok in sorted(ds):
            seq = cum // 2048
            k = (lang, shard, seq)
            n, tot = out.get(k, (0, 0))
            out[k] = (n + 1, tot + n_tok)
            cum += n_tok
    return out


_PACK_LENS = st.one_of(
    st.integers(min_value=0, max_value=300),
    st.sampled_from([2047, 2048, 2049, 2500]),  # cap boundaries + oversize
)


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lens=st.lists(_PACK_LENS, min_size=1, max_size=10),
       langs=st.lists(st.sampled_from(["en", "de"]), min_size=10, max_size=10))
def test_pack_sequences_matches_python_reference(spark, lens, langs):
    """The packing rule — a doc starts a new sequence exactly when the
    running total BEFORE it crossed the next 2048 boundary — must match
    the reference, including docs bigger than the cap (they own their
    bin; later bins skip indices) and zero-token docs (split('') yields
    one empty token, n_tok == 1, same on both sides)."""
    import shutil
    import tempfile

    from reconciliation_hive_data_spark.plans.scale_ops import x_pack_sequences

    docs = [
        (i, " ".join(f"w{j % 5}" for j in range(ln)), langs[i % len(langs)], "src0", ln)
        for i, ln in enumerate(lens)
    ]
    tmp = tempfile.mkdtemp(prefix="rhds_pack_fuzz_")
    try:
        spark.createDataFrame(
            docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).coalesce(1).write.mode("overwrite").parquet(tmp + "/documents.parquet")
        got = {
            (r.lang, r.shard_id, r.seq_id): (r.n_docs, r.seq_tokens)
            for r in x_pack_sequences(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # the reference counts text tokens the same way size(split(text,' ')) does
    expect = _ref_pack(
        (doc_id, lang, len(text.split(" "))) for doc_id, text, lang, _, _ in docs
    )
    assert got == expect


# ---------------------------------------------------------------------------
# differential fuzz: x_zorder Morton interleave + ntile split vs reference
# ---------------------------------------------------------------------------


def _ref_zorder(rows):
    """rows: (user, sec, event_id). Morton-interleave (user%256, hour%256),
    z-sort with event_id tiebreak, SQL-ntile into 16 files, per-file bbox."""
    recs = []
    for u, sec, eid in rows:
        ux, ty = u % 256, (sec // 3600) % 256
        z = 0
        for i in range(8):
            z |= ((ux >> i) & 1) << (2 * i)
            z |= ((ty >> i) & 1) << (2 * i + 1)
        recs.append((z, eid, ux, ty))
    recs.sort()
    n = len(recs)
    base, extra = divmod(n, 16)
    out, pos = {}, 0
    for f in range(1, 17):
        size = base + (1 if f <= extra else 0)
        chunk = recs[pos : pos + size]
        pos += size
        if not chunk:
            continue
        us = [r[2] for r in chunk]
        ts = [r[3] for r in chunk]
        out[f] = (
            len(chunk),
            min(us),
            max(us),
            min(ts),
            max(ts),
            (max(us) - min(us) + 1) * (max(ts) - min(ts) + 1),
        )
    return out


@pytest.mark.soak
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=600),      # user (wraps % 256)
            st.integers(min_value=0, max_value=2_000_000) # sec (hour wraps % 256)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_zorder_matches_python_reference(spark, events):
    """Bit interleave, z-sort tiebreak, and the SQL ntile remainder rule
    (first n%16 files get the extra row; < 16 rows → files 1..n with one
    row each) must all match the reference — including wrapped bucket
    values (user > 255, hour > 255)."""
    import shutil
    import tempfile

    from reconciliation_hive_data_spark.plans.scale_ops import x_zorder

    rows = [(u, sec, i, "view", 1.0) for i, (u, sec) in enumerate(events)]
    tmp = tempfile.mkdtemp(prefix="rhds_zorder_fuzz_")
    try:
        _write_events(spark, tmp, rows)
        got = {
            r.file_id: (r.n_rows, r.min_u, r.max_u, r.min_t, r.max_t, r.bbox_area)
            for r in x_zorder(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert got == _ref_zorder([(u, sec, eid) for u, sec, eid, _, _ in rows])


# ---------------------------------------------------------------------------
# cross-tier consistency: recon_bucket_drill rows vs recon_bucket_hash counts
# ---------------------------------------------------------------------------


def test_bucket_drill_agrees_with_bucket_hash_counts(spark, sf_dir):
    """The two Merkle tiers must tell one story on the standard faulty
    pair: the digest report's n_bad_keys per bucket equals the drill's
    row count per bucket, every drilled bucket is a flagged bucket, and
    the drill's fault classes account for the injected fault families
    (drops → missing_in_target, duplicates → copy_count, drifts/nulls →
    drift; missing_in_source cannot occur — the target never invents
    keys)."""
    from reconciliation_hive_data_spark.plans.recon_scale import (
        recon_bucket_drill,
        recon_bucket_hash,
    )

    report = {r.bucket: r.n_bad_keys for r in recon_bucket_hash(spark, sf_dir).collect()}
    drill = recon_bucket_drill(spark, sf_dir).collect()
    per_bucket = defaultdict(int)
    for r in drill:
        per_bucket[r.bucket] += 1
        assert r.fault in {"missing_in_target", "copy_count", "drift"}, r
        if r.fault == "missing_in_target":
            assert r.src_copies == 1 and r.tgt_copies == 0
        elif r.fault == "copy_count":
            assert r.src_copies != r.tgt_copies
        else:
            assert r.src_copies == r.tgt_copies
    assert dict(per_bucket) == {b: n for b, n in report.items() if n > 0}
