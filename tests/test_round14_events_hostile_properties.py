"""Round-14 hostile-input fuzz for the events-table family — the last
family SURVEY §7 lists as unswept (VERDICT r13 item 3). Scope follows the
verdict's adjudication exactly:

- **NULL user_id / event_type / props / value** — the corrupt-row class
  that poisoned the documents dedup (r13) and the stateful stream (r12);
  at 100 TB one NULL-keyed event must neither kill a job nor silently
  diverge from the oracle.
- **Extreme int64 ids** — user_id / event_id at ±2^62, -1, and 40-bit
  values: bitwise ops, modulo salts, z-order bit interleaving, and md5
  bucketing must agree across engines over the whole int64 line.
- **Hostile props JSON** — malformed fragments, deep nesting, huge
  payloads, non-integer `k` values: every `$.k` extraction path must
  converge with DuckDB instead of ANSI-aborting or erroring the oracle.
- events.value NaN stays OUT of contract (r12 money adjudication), and
  ts stays a valid timestamp (the µs-boundary calendar sweep is r10's).

The replay set is every registered query that reads the events table:
28 batch queries + the streaming family's oracle-checked rows (their
batch twins), via the test_round10 oracle-parity mechanism.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .test_round10_properties import _oracle_parity

# -- replay sets -------------------------------------------------------------

#: every registered batch query whose only input is the events table
#: (derived by grepping load(spark, sf_dir, "events") over the registry —
#: re-derived r14; sink_csv included: its r13 hardening must hold for
#: hostile props strings too)
_EVENTS_BATCH_QUERIES = (
    "agg_approx",
    "agg_histogram",
    "agg_mode",
    "agg_reaggregate",
    "fn_bitwise",
    "fn_map_json",
    "fn_variant",
    "join_asof",
    "join_range",
    "join_self",
    "join_skew_salted",
    "join_theta",
    "recon_partition_complete",
    "s_checkpoint_resume",
    "scan_orc",
    "set_bagops",
    "sink_csv",
    "sketch_cms",
    "udtf_apply",
    "win_firstlast",
    "win_lag",
    "win_moving",
    "win_range",
    "win_running",
    "win_sessionize",
    "x_attribution",
    "x_gapfill",
    "x_zorder",
)

#: the streaming family's oracle-checked queries (s_watermark is rows-only
#: by design and stays out; s_stream_static also reads the customer dim,
#: which the writer below provides)
_EVENTS_STREAM_QUERIES = (
    "src_stream",
    "s_tumbling",
    "s_sliding",
    "s_session",
    "s_dedup_state",
    "s_stream_static",
    "s_stream_stream",
    "s_stateful_custom",
    "s_foreachbatch",
)

# -- writers -----------------------------------------------------------------

#: tiny customer dim so s_stream_static's broadcast side exists; user ids
#: 0-3 match segments, hostile ids fall out of the inner join on both
#: engines identically
_CUSTOMERS = [
    (0, "Customer#0", 1, 100.0, "BUILDING"),
    (1, "Customer#1", 2, 200.0, "MACHINERY"),
    (2, "Customer#2", 3, 300.0, "BUILDING"),
    (3, "Customer#3", 1, 400.0, "AUTOMOBILE"),
]


def _write_events_hostile(spark, d: str, rows) -> None:
    """rows: (event_id, ts_us, user_id, event_type, value, props) →
    {d}/events.parquet as a SINGLE pyarrow µs-timestamp file (the r12
    streaming-fuzz convention: the readStream source's pathGlobFilter
    matches leaf file names, so the fixture must be a file named
    events.parquet, not a Spark-written directory) + a minimal customer
    dim for the stream-static join. All non-ts fields nullable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        d + "/events.parquet",
    )
    spark.createDataFrame(
        _CUSTOMERS,
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/customer.parquet")


# -- strategies --------------------------------------------------------------

#: hostile-but-legal props zoo. Every entry is a STRING the ingest could
#: really carry: well-formed objects with non-integer k, malformed
#: fragments, deep nesting, huge arrays, unicode keys/values.
_PROPS = [
    None,                                          # NULL props
    "",                                            # empty string
    "{}",                                          # empty object
    '{"k": 87}',                                   # fixture shape
    '{"k": -3}',                                   # negative k
    '{"k": 0}',
    '{"k": "abc"}',                                # k is a string
    '{"k": "12"}',                                 # k is a numeric string
    '{"k": 3.9}',                                  # k is a float
    '{"k": 1099511627776}',                        # k overflows int32
    '{"k": null}',                                 # explicit JSON null
    '{"k": true}',                                 # k is a boolean
    '{"k": [1, 2]}',                               # k is an array
    '{"k": {"n": 5}}',                             # k is an object
    "not json at all",                             # malformed
    '{"k": 87',                                    # truncated object
    "[1, 2, 3]",                                   # top-level array
    '"bare string"',                               # top-level scalar
    "null",                                        # top-level null
    '{"K": 5}',                                    # wrong-case key
    '{"k": 3.0}',                                  # integral-valued double
    '{"k": 1e2}',                                  # exponent form
    '{"k": -3.9}',                                 # negative float
    '{"k": 1e20}',                                 # int64-overflow double
    '{"k": 9.3e18}',                               # just past int64 max
    '{"k": 2147483648}',                           # int32-overflow int
    '{"k": 9223372036854775807}',                  # int64 max
    '{"k": 18446744073709551615}',                 # uint64 max
    '{"k": false}',
    '{"k": "3.9"}',                                # decimal text
    '{"k": " 12 "}',                               # space-padded text
    '{"k": "+5"}',                                 # signed text
    '{"k": ""}',                                   # empty text
    '{"k": "0x10"}',                               # hex text
    '{"k": "1e3"}',                                # exponent text
    '{"k": "99999999999999999999999"}',            # bigint-overflow text
    '{"k": -0.5}',                                 # truncates toward zero
    '{"k": 2.9999995}',                            # carry-risk fraction
    '{"k": 1.5e3}',                                # fractional exponent form
    # NOT in the pool, adjudicated out of the parity contract:
    # - '{"k": 1, "k": 2}' (duplicate key): RFC 8259 leaves it
    #   unpredictable and Spark's own paths disagree (get_json_object
    #   first-wins, from_json last-wins, variant parse REJECTS) — no
    #   oracle convention exists; no-abort pinned separately below.
    # - '{"k": NaN}' (non-standard token): DuckDB's yyjson parses it as
    #   a valid DOUBLE, Spark's Jackson rejects the whole document — a
    #   parser-model fork; no-abort pinned separately below.
    # - integer literals beyond uint64: DuckDB demotes to DOUBLE, Spark's
    #   variant keeps exact DECIMAL — same fork class.
    # - ASCII-control padding inside numeric text ('{"k": "12\\t"}'):
    #   Spark's cast trims all control chars <= 0x20, SQL trim only
    #   spaces — realistic ingest pads with spaces at most.
    # - fractional literals with >15-16 significant digits
    #   ('{"k": 4611686018427387903.9}', r15/ADVICE r14): Spark's variant
    #   stores exact DECIMAL and truncates exactly; DuckDB's yyjson
    #   re-renders every DOUBLE-typed token through binary64 BEFORE any
    #   oracle cast can see it (probed: json_extract/_string/_path_text
    #   all emit '4611686018427388000.0') — no decimal-exact oracle is
    #   expressible. Spark's exact answers pinned as known-answer tests
    #   in test_round15_schema_evolve.py.
    # - double-overflow numeric literals ('{"k": 1e309}', r15/ADVICE
    #   r14): DuckDB probes json_valid/DOUBLE and extracts 'Infinity';
    #   fn_map_json's [.eE] carve gate rides on Spark's gjo
    #   re-serialization of a token binary64 can't hold — parser-model
    #   fork, no-abort pinned below.
    '{ "k" :\t42 }',                               # whitespace chaos
    '{"k": 7, "nested": {"a": {"b": {"c": [1, {"d": 2}]}}}}',
    '{"日本": "データ", "k": 9}',                   # unicode member
    '{"k": 5, "pad": "' + "x" * 4096 + '"}',       # huge payload
    "{" + ",".join(f'"p{i}": {i}' for i in range(200)) + ', "k": 3}',
]

#: user/event ids: dense small values (so joins/windows have real groups)
#: plus the extreme-int64 zoo (sign boundaries, -1's all-ones bit pattern,
#: a 40-bit id; NOT int64 min/max themselves — abs(min) overflows on both
#: engines but via different abort paths, adjudicated out of contract)
_USER_IDS = [None, 0, 1, 2, 3, -1, 2**40, 2**62, -(2**62)]
_ETYPES = [None, "click", "view", "purchase", "signup", "error", ""]

_EVENTS = st.lists(
    st.tuples(
        st.sampled_from([0, 1, 2, 3, -1, 2**40, 2**62, -(2**62)]),  # event_id
        st.integers(min_value=0, max_value=72).map(
            lambda h: 1_704_067_200_000_000 + h * 3_600_000_000
        ),                                                          # ts_us
        st.sampled_from(_USER_IDS),
        st.sampled_from(_ETYPES),
        st.one_of(
            st.none(),
            st.integers(min_value=-10_000, max_value=10_000).map(
                lambda c: c / 100.0
            ),
        ),                                                          # value
        st.sampled_from(_PROPS),
    ),
    min_size=1,
    max_size=14,
    unique_by=lambda t: t[0],                                       # event_id
)


@pytest.mark.soak
@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_EVENTS)
def test_events_batch_family_matches_oracle_on_hostile_events(spark, events):
    """All 28 events-only batch oracle queries replayed against DuckDB on
    streams containing NULL user/type/value/props, extreme int64 ids, and
    hostile props JSON."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="rhds_events_hostile_")
    try:
        _write_events_hostile(spark, d, events)
        _oracle_parity(spark, d, _EVENTS_BATCH_QUERIES)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# -- pinned worst case: every hostile shape in ONE stream ---------------------

_H = 3_600_000_000
_T0 = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs

_PINNED = [
    # (event_id, ts_us, user_id, event_type, value, props)
    (0, _T0, None, None, None, None),                 # fully NULL row
    (1, _T0 + 1, 0, "click", 1.25, '{"k": 87}'),      # fixture shape
    (2, _T0 + _H, 0, "view", -2.50, '{"k": "abc"}'),
    (3, _T0 + _H + 1, 1, "", 0.0, "not json at all"),
    (4, _T0 + 2 * _H, 1, "purchase", 3.75, '{"k": 87'),
    (5, _T0 + 3 * _H, 2, "click", None, '{"k": 1099511627776}'),
    (6, _T0 + 3 * _H + 1, 2, "error", 9.99, '{"k": null}'),
    (7, _T0 + 4 * _H, 3, "signup", 5.00, '{"k": {"n": 5}}'),
    (-1, _T0 + 5 * _H, -1, "click", 7.00, "[1, 2, 3]"),
    (2**40, _T0 + 6 * _H, 2**40, "view", 2.00, '{"k": 3.9}'),
    (2**62, _T0 + 7 * _H, 2**62, "purchase", 4.00, '{"k": -3}'),
    (-(2**62), _T0 + 8 * _H, -(2**62), "error", 6.00,
     '{"k": 5, "pad": "' + "x" * 4096 + '"}'),
    (8, _T0 + 9 * _H, None, "click", 8.00, '{"K": 5}'),
    (9, _T0 + 9 * _H + 1, 3, None, 1.00,
     '{"k": 7, "nested": {"a": {"b": {"c": [1, {"d": 2}]}}}}'),
    # a MEASURED purchase bucket whose only value is NULL — x_gapfill must
    # flag it filled=0 (present, value unknown), not imputed (r14 soak
    # find: the plan tested sum_value IS NULL where the oracle tests
    # row-presence; LOCF still carries the prior value over it)
    (10, _T0 + 11 * _H, 1, "purchase", None, "{}"),
    # r15 in-contract fractional shapes (the out-of-contract >15-sig-digit
    # cousins are pinned Spark-side in test_round15_schema_evolve.py)
    (11, _T0 + 12 * _H, 2, "view", 1.50, '{"k": -0.5}'),
    (12, _T0 + 12 * _H + 1, 3, "click", 2.25, '{"k": 2.9999995}'),
    (13, _T0 + 13 * _H, 0, "error", -1.00, '{"k": 1.5e3}'),
]


def test_events_batch_family_on_pinned_hostile_stream(spark, tmp_path):
    """Deterministic replay of the full hostile shape set through every
    batch query — keeps the class closed without hypothesis search luck
    (the r13 pinned-corpus convention)."""
    d = str(tmp_path)
    _write_events_hostile(spark, d, _PINNED)
    _oracle_parity(spark, d, _EVENTS_BATCH_QUERIES)


def test_duplicate_key_props_never_abort_any_spark_path(spark, tmp_path):
    """Duplicate-key and non-standard-token JSON are out of the PARITY
    contract (engines and even Spark's own extractors disagree — see the
    pool comment), but they must never abort: all three extraction paths
    (get_json_object, from_json, variant) and the CSV sink round trip
    return rows on a corpus of 100% such objects."""
    d = str(tmp_path)
    shapes = ['{"k": 1, "k": 2}', '{"k": NaN}', '{"k": Infinity}',
              '{"k": 99999999999999999999999}',
              # r15 additions: high-precision fractional + double-overflow
              # literals (see the pool comment's out-of-contract list)
              '{"k": 4611686018427387903.9}', '{"k": 1e309}',
              '{"k": -1e309}', '{"k": 9223372036854775807.5}']
    rows = [
        (i, _T0 + i * _H, i % 3, "click", 1.0, shapes[i % len(shapes)])
        for i in range(8)
    ]
    _write_events_hostile(spark, d, rows)

    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    for name in ("fn_map_json", "fn_variant", "sink_csv"):
        assert registry.get(name).fn(spark, d).count() > 0, name


def test_events_stream_family_on_pinned_hostile_stream(spark, tmp_path):
    """The streaming family (batch-twin oracles) over the same pinned
    hostile stream: NULL-keyed and extreme-id events must flow through
    watermarks, state stores, and the stream-static join identically to
    the batch plan."""
    d = str(tmp_path)
    _write_events_hostile(spark, d, _PINNED)
    _oracle_parity(spark, d, _EVENTS_STREAM_QUERIES)
