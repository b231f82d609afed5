"""Round-12 hostile-input fuzz for the scalar-function family (SURVEY §2h +
§2-modern: fn_* / udf_sql / sql_pipe) — the same campaign that swept the
aggregate / window / relational / streaming / embeddings families, pointed
at the expression surface.

Two tests with two distinct domains:

1. **Oracle-parity domain** — hostile-but-cross-engine-agreed inputs: the
   full unicode string zoo minus locale-sensitive case mappings, dates
   1583..9998, in-contract money, valid JSON with int32 ``k``, URL-safe
   sources, finite non-empty vectors, non-negative user ids.  Every query
   must hash-match its DuckDB twin exactly.
2. **Robustness domain** — everything the parity domain excludes because
   the ORACLE engine (not ours) errors or the engines legitimately
   disagree: malformed JSON, RFC-invalid URL material, ß/İ/ligature case
   mappings, year-9999 interval overflow, empty / NaN / ±inf vectors,
   negative user ids.  Every query must still COMPLETE on Spark — one
   dirty row in 100 TB must never abort a job.  (This is the domain that
   caught the r12 parse_url / parse_json / variant_get abort class and
   fn_string's strict-concat NULL leak.)

Deliberately OUT of both domains: out-of-contract money (NaN/±inf/1e300 in
a *_price / acctbal column).  Money columns are exact-decimal-routed
throughout the engine (canonical.py); a value outside DECIMAL(18,2)'s
domain is a data-contract violation, and the decimal cast failing LOUDLY
is the behavior a reconciliation engine wants — silently NULL-hashing a
corrupted money value would manufacture a false "match" verdict.

Engine-semantics notes pinned by this fuzz (probed r12, both engines):
- DuckDB errors where Spark degrades per-row: ln/sqrt of non-positive
  (Spark NULL/NaN), CAST('1.5' AS INT) (Spark ANSI errors too, but
  from_json typed-schema gives NULL), ``<<`` of a negative or past int64
  (Spark shiftleft wraps two's-complement either way), list_reduce of an
  empty list (Spark
  aggregate returns the init), json_extract of malformed JSON (Spark
  get_json_object gives NULL).
- Case mapping is locale-table-sensitive: upper('ß') = 'SS' (JVM) vs 'ẞ'
  (utf8proc); lower('İ') keeps the combining dot on the JVM only;
  upper('ﬀ') widens to 'FF' on the JVM only.
- Spark struct equality treats per-field NULLs as equal (ordering
  semantics); DuckDB struct ``=`` is three-valued → struct-compare
  fields stay non-null in the parity domain.
- DuckDB epoch() is a double (µs fraction rounds at the BIGINT cast);
  Spark unix_timestamp truncates — sub-second timestamps sit in the
  robustness domain only for epoch-emitting queries.
"""

from __future__ import annotations

import pytest
from datetime import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .parity import compare as _compare

# --------------------------------------------------------------------------
# pools
# --------------------------------------------------------------------------

#: unicode zoo, minus locale-sensitive case mappings (ß İ ı ﬀ …)
_CASE_STABLE = [
    "", None, "é", "ÉCLAIR Ünïcødé", "x\U0001F4A5emoji", "a\nb", "tab\tsep",
    'quote"d', "back\\slash", "né#é#three", "Customer#000000001", " pad ",
    "UPPER lower MiXeD", "Customer#" + "9" * 40, "x" * 300, "no delim here",
    "汉字文本", "#leading", "trailing#",
]
_SEGS = ["", None, "BUILDING", "aut\U0001F697", " s ", "média"]
#: full zoo incl. the case-mapping divergers — regex/hash/length queries
#: don't case-map, so these stay parity-safe for documents.text
_HOSTILE_TEXT = _CASE_STABLE + ["ß", "İstanbul", "ﬀ ligature", "ı dotless"]
_DATES = [
    datetime(1583, 1, 1), datetime(1899, 12, 31, 23, 59, 59),
    datetime(1969, 12, 31, 23, 59, 59), datetime(1970, 1, 1),
    datetime(2000, 2, 29, 12, 0, 0), datetime(2262, 4, 11),
    datetime(9998, 12, 31, 23, 59, 59), datetime(1996, 2, 15), None,
]
#: in-contract money: exact-cents values only (see module docstring)
_MONEY = [None, -5.0, 0.0, 0.01, 123.45, 9999999.99]
_PRICE_POS = [None, 0.01, 5.0, 123.45, 9999999.99, 0.001]  # ln() oracle domain
_QTY = [None, 0.0, 1.0, 23.5, 35.0, 1000000.0]             # sqrt() domain; ≥30 rows feed sql_pipe
_DISC = [None, 0.0, 0.05, 0.08]
_IDS = [0, 1, 7, 255, 2**40, 2**62 - 1]                    # non-negative: DuckDB << domain
#: user_id feeds ``<< 8``: DuckDB ERRORS on int64 shift overflow where
#: Spark shiftleft wraps two's-complement (probed r12) — parity caps at
#: 2^55-1 (max shifted value 2^63-256); 2^62-scale user ids live in the
#: robustness domain below, where Spark completes by wrapping.
_UIDS = [0, 1, 7, 255, 2**40, 2**55 - 1]
_EIDS = _IDS + [-1, -255, -(2**40)]                        # event_id may go negative (>> agrees)
_JSON_OK = [
    '{"k": 87}', '{"k": -3}', '{"k": 0}', '{"k": 2147483647}', "{}",
    '{"k": null}', None, '{"other": 1}', '{"k": 87, "j": 2}',
]
_VEC_OK = [
    [0.0, 0.0, 0.0, 0.0], [1.5, -2.5, 3.25, 11.0], [0.1, 0.2, 0.3],
    [-7.5], [2.5, 2.5], [1000.0, -1000.0],
    [float(i) - 3.5 for i in range(8)],
]
_SRC_OK = [None, "web", "cc-2024", "a1-b2"]

_PARITY_NAMES = (
    "fn_string", "fn_regex", "fn_date", "fn_math", "fn_cond", "fn_hash",
    "fn_array", "fn_map_json", "fn_cast", "fn_bitwise", "fn_url",
    "fn_lambda", "fn_struct", "fn_variant", "udf_sql", "sql_pipe",
)


def _write_scalar_tables(spark, d, n, shift):
    """One synthetic sf_dir feeding every table the family reads. Written
    BY SPARK (INT96 timestamps) so each example also exercises the
    loader's vintage routing — the standard fuzz-through-the-real-load-
    path shape (tests/test_round10_properties.py precedent)."""
    P = n

    def pick(pool, i, salt=0):
        return pool[(i + shift + salt) % len(pool)]

    spark.createDataFrame(
        [(i, pick(_CASE_STABLE, i), i % 5, pick(_MONEY, i), pick(_SEGS, i))
         for i in range(P)],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/customer.parquet")
    spark.createDataFrame(
        [(i, pick(_CASE_STABLE, i, 3), i % 5, pick(_MONEY, i, 1))
         for i in range(P)],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/supplier.parquet")
    spark.createDataFrame(
        [(i, pick(_CASE_STABLE, i, 5), pick(_SEGS, i, 2), "T", i,
          pick(_MONEY, i, 2)) for i in range(P)],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/part.parquet")
    spark.createDataFrame(
        [(i, i, ["O", "F", "P"][i % 3], pick(_MONEY, i, 3), pick(_DATES, i),
          ["1-URGENT", "2-HIGH", "3-MEDIUM"][i % 3]) for i in range(P)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/orders.parquet")
    spark.createDataFrame(
        [(i, 1, 1, i, pick(_QTY, i), pick(_PRICE_POS, i, 1), pick(_DISC, i),
          0.02, "A", "O", pick(_DATES, i, 2)) for i in range(P)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/lineitem.parquet")
    spark.createDataFrame(
        [(pick(_EIDS, i), pick(_DATES[:-1], i), pick(_UIDS, i, 1), "click",
          1.0, pick(_JSON_OK, i)) for i in range(P)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
    spark.createDataFrame(
        [(i, pick(_HOSTILE_TEXT, i), "en", pick(_SRC_OK, i),
          len(pick(_HOSTILE_TEXT, i) or "")) for i in range(P)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    spark.createDataFrame(
        [(i, pick(_VEC_OK, i), i % 3) for i in range(P)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/embeddings.parquet")


@pytest.mark.soak
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=19, max_value=57),
    shift=st.integers(min_value=0, max_value=18),
)
def test_scalar_family_matches_oracle_on_hostile_inputs(
    spark, tmp_path_factory, n, shift
):
    """Every §2h/§2-modern query hash-matches its DuckDB twin on inputs
    the fixture never exhibits: NULLs in every free-form column, empty and
    300-char and emoji and newline strings, pre-epoch and year-9998
    timestamps, negative/zero/None money, missing/null/negative JSON keys,
    single-element and all-zero vectors, 2^62 ids.  n/shift rotate which
    pool value lands in which row so pool alignments vary per example."""
    d = str(tmp_path_factory.mktemp("scalarfuzz"))
    _write_scalar_tables(spark, d, n, shift)

    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    problems = []
    for name in _PARITY_NAMES:
        spec = registry.get(name)
        problems += _compare(spec.fn(spark, d), spec.oracle, d, name)
    assert not problems, problems


# --------------------------------------------------------------------------
# robustness domain — Spark must never abort; the oracle engine may error
# --------------------------------------------------------------------------

_NASTY_STRINGS = _HOSTILE_TEXT + ["%zz bad escape", "http://x y/z?=%", "🚗" * 99]
_NASTY_JSON = ['not json', "", "[1,2,3]", '{"k": {"nested": 1}}',
               '{"k": "str"}', '{"k": 1.5}', '{"k": 9223372036854775807}',
               '{"k": 87, "k": 88}', "{", None]
_NASTY_VECS = [[], None, [float("nan"), 1.0], [float("inf"), 1.0],
               [float("-inf")], [1e30, 1e30], [0.0]]
_NASTY_DATES = _DATES + [datetime(9999, 12, 31, 23, 59, 59),
                         datetime(1969, 12, 31, 23, 59, 59, 999999)]


@pytest.mark.soak
def test_scalar_family_never_aborts_on_dirty_rows(spark, tmp_path):
    """The Spark side of every scalar query COMPLETES over rows the parity
    domain excludes — malformed JSON/URL material, locale-trap case
    mappings, year-9999 interval overflow, empty/NaN/±inf vectors,
    negative user ids.  This is the no-crash contract: one dirty row in a
    100 TB corpus degrades to NULL in that row's outputs, never to a job
    abort.  (Pre-repair, parse_url / parse_json / variant_get each killed
    the whole query here.)"""
    d = str(tmp_path / "nasty")
    P = 24

    def pick(pool, i, salt=0):
        return pool[(i + salt) % len(pool)]

    spark.createDataFrame(
        [(i, pick(_NASTY_STRINGS, i), i % 5, pick(_MONEY, i),
          pick(_NASTY_STRINGS, i, 1)) for i in range(P)],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/customer.parquet")
    spark.createDataFrame(
        [(i, pick(_NASTY_STRINGS, i, 2), i % 5, pick(_MONEY, i, 1))
         for i in range(P)],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/supplier.parquet")
    spark.createDataFrame(
        [(i, pick(_NASTY_STRINGS, i, 3), pick(_NASTY_STRINGS, i, 4), "T", i,
          pick(_MONEY, i, 2)) for i in range(P)],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/part.parquet")
    spark.createDataFrame(
        [(i, i, pick(["O", "F", None], i), pick(_MONEY, i, 3),
          pick(_NASTY_DATES, i), pick(["1-URGENT", None, "x"], i))
         for i in range(P)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/orders.parquet")
    spark.createDataFrame(
        [(i, 1, 1, i, pick(_QTY, i), pick(_MONEY, i, 1), pick(_DISC, i),
          0.02, "A", "O", pick(_NASTY_DATES, i, 2)) for i in range(P)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/lineitem.parquet")
    spark.createDataFrame(
        [(pick(_EIDS, i), pick(_DATES[:-1], i), pick(_EIDS, i, 1), "click",
          1.0, pick(_NASTY_JSON, i)) for i in range(P)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
    spark.createDataFrame(
        [(i, pick(_NASTY_STRINGS, i), "en", pick(_NASTY_STRINGS, i, 5),
          len(pick(_NASTY_STRINGS, i) or "")) for i in range(P)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    spark.createDataFrame(
        [(i, pick(_NASTY_VECS, i), i % 3) for i in range(P)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/embeddings.parquet")

    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    failures = []
    for name in _PARITY_NAMES:
        try:
            n_rows = registry.get(name).fn(spark, d).count()
        except Exception as e:  # noqa: BLE001 — the assertion IS "no exception"
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:160]}")
            continue
        if n_rows <= 0:
            failures.append(f"{name}: produced {n_rows} rows from {P} inputs")
    assert not failures, failures
