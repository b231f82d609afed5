"""Unit tests for the registry's verification-rotation ordering — the
mechanism that decides which queries an external correctness sweep with a
bounded budget sees first. Load-bearing for the driver contract, so the
ordering rules are pinned here without any Spark session.
"""

from __future__ import annotations

from reconciliation_hive_data_spark import registry

registry.load_all_modules()


def _current_snapshot() -> dict[str, str]:
    return {
        n: registry.oracle_hash(s.oracle)
        for n, s in registry.REGISTRY.items()
        if s.oracle is not None
    }


def _order_with(
    monkeypatch,
    rounds: dict[str, int],
    modified: dict[str, int],
    snapshot: dict[str, str] | None = None,
):
    monkeypatch.setattr(registry, "_verified_rounds", lambda: rounds)
    monkeypatch.setattr(registry, "_MODIFIED_IN_ROUND", modified)
    snap = _current_snapshot() if snapshot is None else snapshot
    monkeypatch.setattr(registry, "_oracle_snapshot", lambda: snap)
    return registry.ordered_names()


def test_never_verified_sort_first_in_registration_order(monkeypatch):
    names = list(registry.REGISTRY)
    some_verified = {n: 1 for n in names[10:]}
    order = _order_with(monkeypatch, some_verified, {})
    assert order[:10] == names[:10]
    assert all(n in some_verified for n in order[10:])


def test_rewritten_queries_requeue_by_staleness(monkeypatch):
    names = list(registry.REGISTRY)
    a, b, c = names[0], names[1], names[2]
    rounds = {n: 3 for n in names}
    rounds[a], rounds[b], rounds[c] = 2, 1, 2
    modified = {a: 3, b: 3, c: 3}
    order = _order_with(monkeypatch, rounds, modified)
    # b has the stalest row (r1) so it re-verifies first; a/c tie on round
    # and fall back to registration order
    assert order[:3] == [b, a, c]


def test_rewrite_marker_expires_once_reverified(monkeypatch):
    names = list(registry.REGISTRY)
    a = names[0]
    rounds = {n: 1 for n in names}
    rounds[a] = 3  # a row at/after the rewrite round exists
    order = _order_with(monkeypatch, rounds, {a: 3})
    # a is the MOST recently verified → very back, not front
    assert order[-1] == a


def test_oracle_rewrite_fronts_like_a_plan_rewrite(monkeypatch):
    """A query whose oracle text changed after its last verification row
    re-fronts, even with the freshest row — the hole the round-5 verdict
    flagged (x_multimodal_binary's r5 oracle upgrade went untracked)."""
    oracled = [n for n, s in registry.REGISTRY.items() if s.oracle is not None]
    a = oracled[0]
    rounds = {n: 5 for n in registry.REGISTRY}
    snap = _current_snapshot()
    snap[a] = "0" * 32  # a's row attested different oracle text
    order = _order_with(monkeypatch, rounds, {}, snap)
    assert order[0] == a


def test_missing_snapshot_entry_fronts(monkeypatch):
    """An oracled+verified query absent from the snapshot fronts — the safe
    default for an untracked oracle (forgotten tool run)."""
    oracled = [n for n, s in registry.REGISTRY.items() if s.oracle is not None]
    a = oracled[3]
    rounds = {n: 5 for n in registry.REGISTRY}
    snap = _current_snapshot()
    del snap[a]
    order = _order_with(monkeypatch, rounds, {}, snap)
    assert order[0] == a


def test_oracle_marker_expires_once_snapshot_refreshed(monkeypatch):
    """After tools/update_oracle_snapshot.py stamps the current text, the
    query falls back into the normal staleness rotation."""
    oracled = [n for n, s in registry.REGISTRY.items() if s.oracle is not None]
    a = oracled[0]
    rounds = {n: 1 for n in registry.REGISTRY}
    rounds[a] = 5
    order = _order_with(monkeypatch, rounds, {}, _current_snapshot())
    assert order[-1] == a


def test_rows_only_queries_never_front_via_snapshot(monkeypatch):
    """oracle=None queries have nothing to hash: the snapshot mechanism must
    not touch them (plan rewrites use _MODIFIED_IN_ROUND)."""
    rows_only = [n for n, s in registry.REGISTRY.items() if s.oracle is None]
    rounds = {n: 5 for n in registry.REGISTRY}
    order = _order_with(monkeypatch, rounds, {}, {})  # empty snapshot
    # with an EMPTY snapshot every oracled query fronts; the rows-only ones
    # must all sort behind them
    tail = order[-len(rows_only):]
    assert sorted(tail) == sorted(rows_only)


def test_v2_snapshot_entries_are_read(monkeypatch):
    """ORACLE_SNAPSHOT entries are {"hash":…, "round":…} dicts (v1 bare
    strings still parse); _oracle_changed must read both."""
    oracled = [n for n, s in registry.REGISTRY.items() if s.oracle is not None]
    a, b = oracled[0], oracled[1]
    rounds = {n: 5 for n in registry.REGISTRY}
    snap: dict = {
        n: {"hash": registry.oracle_hash(s.oracle), "round": 5}
        for n, s in registry.REGISTRY.items()
        if s.oracle is not None
    }
    snap[a] = {"hash": "0" * 32, "round": 5}  # v2 entry, stale hash
    snap[b] = "0" * 32  # v1 entry, stale hash
    order = _order_with(monkeypatch, rounds, {}, snap)
    assert set(order[:2]) == {a, b}


def test_snapshot_file_on_disk_is_wellformed():
    """The committed ORACLE_SNAPSHOT.json names a subset of the registry's
    oracled queries and every entry carries a 32-hex hash."""
    import re

    snap = registry._oracle_snapshot()
    assert snap, "snapshot must exist and be non-empty"
    oracled = {n for n, s in registry.REGISTRY.items() if s.oracle is not None}
    assert set(snap) <= oracled, set(snap) - oracled
    for name, entry in snap.items():
        h = registry.snapshot_hash(entry)
        assert h and re.fullmatch(r"[0-9a-f]{32}", h), (name, entry)


def test_snapshot_tool_never_stamps_away_an_older_missing_entry():
    """tools/update_oracle_snapshot.py's missing-entry branch: a query
    whose latest row is OLDER than the latest round must stay absent from
    the snapshot (it fronts until re-verified — the safe default
    test_missing_snapshot_entry_fronts pins). Stamping it from current
    text would cancel that forced re-verification in one tool run."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "update_oracle_snapshot",
        os.path.join(registry.repo_root(), "tools", "update_oracle_snapshot.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # untracked + never rowed, or rowed in the latest round: stamp
    assert mod.stamp_due(None, last_row=0, latest=6, seed_all=False)
    assert mod.stamp_due(None, last_row=6, latest=6, seed_all=False)
    # untracked with only an OLDER row: keep fronting
    assert not mod.stamp_due(None, last_row=3, latest=6, seed_all=False)
    # tracked entries: restamp only when a NEWER latest-round row attests
    assert mod.stamp_due({"hash": "x", "round": 3}, 6, 6, seed_all=False)
    assert not mod.stamp_due({"hash": "x", "round": 6}, 6, 6, seed_all=False)
    assert not mod.stamp_due({"hash": "x", "round": 3}, 4, 6, seed_all=False)
    # v1 bare-string entries behave like round-0 dicts
    assert mod.stamp_due("x", 6, 6, seed_all=False)
    # --seed-all overrides everything (bootstrap path)
    assert mod.stamp_due(None, 3, 6, seed_all=True)


def test_ordering_is_a_permutation_of_the_registry(monkeypatch):
    names = list(registry.REGISTRY)
    order = _order_with(monkeypatch, {names[5]: 2}, {})
    assert sorted(order) == sorted(names)


def test_live_ordering_matches_correctness_artifacts():
    """With the real CORRECTNESS files on disk: every query with no row sorts
    before every query with one (modified-marker holders excepted)."""
    registry.load_all_modules()
    rounds = registry._verified_rounds()
    snapshot = registry._oracle_snapshot()
    order = registry.ordered_names()
    seen_verified = False
    for n in order:
        has_row = n in rounds
        if not has_row:
            assert not seen_verified, f"never-verified {n} after a verified query"
        elif registry._MODIFIED_IN_ROUND.get(n, 0) <= rounds[n] and not (
            registry._oracle_changed(n, snapshot)
        ):
            seen_verified = True


def test_oracles_reference_only_known_tables():
    """Static sanity over every oracle SQL string: any bare FROM/JOIN
    table identifier must be a driver-registered view or a CTE defined in
    the same oracle — a typo'd table name should fail here, not in the
    driver's DuckDB run."""
    import re

    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    known = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }
    for name, spec in registry.REGISTRY.items():
        if not spec.oracle:
            continue
        # strip `--` line comments (prose like "differs from X") and
        # EXTRACT(unit FROM expr) calls — both contain FROM tokens that
        # are not table references
        sql = re.sub(r"--[^\n]*", "", spec.oracle)
        sql = re.sub(r"EXTRACT\s*\([^)]*\)", "", sql, flags=re.I)
        # SQL keywords are case-insensitive, so lowercase-normalize once and
        # match everything (CTE extraction, FROM/JOIN refs, the DISTINCT
        # lookbehind) against the normalized text — a lowercase `with x as (`
        # or `is not distinct from` must behave like its uppercase twin.
        low = sql.lower()
        # CTE names defined in this oracle — WITH a AS (...), b AS (...),
        # including the column-list form `WITH a(x, y) AS (...)`
        ctes = set(
            re.findall(
                r"(?:with|,)\s*(?:recursive\s+)?([a-z_][\w]*)"
                r"\s*(?:\([^)]*\))?\s+as\s*\(",
                low,
            )
        )
        refs = set(
            m.group(1)
            for m in re.finditer(
                # exclude the comparison operator `IS [NOT] DISTINCT FROM x`
                r"(?<!distinct )\b(?:from|join)\s+([a-z_][\w]*)",
                low,
            )
        )
        unknown = refs - known - ctes
        # subquery openers / functions caught by the regex are fine to list
        allowed_noise = {"range", "generate_series", "unnest", "read_parquet"}
        unknown -= allowed_noise
        assert not unknown, f"{name}: oracle references unknown tables {unknown}"
