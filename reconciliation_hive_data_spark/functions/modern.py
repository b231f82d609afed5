"""Spark 4 SQL-surface operators: Variant, SQL-defined UDFs, pipe syntax.

Three entry points a current-generation Spark user expects, each with a
classic-SQL DuckDB twin so the modern surface is held to the same
hash-check as everything else:

- ``fn_variant`` — the VARIANT semi-structured type (parse_json →
  variant_get): Spark's answer to schema-on-read JSON columns, binary-
  encoded and predicate-pushable, vs the string-re-parse get_json_object
  path fn_map_json covers.
- ``udf_sql`` — CREATE FUNCTION ... RETURN <expr> (SQL-defined scalar
  functions, Spark 4.0): user extension WITHOUT leaving codegen — the
  planner inlines the body, so unlike every Python UDF row there is no
  serialization boundary at all.
- ``sql_pipe`` — SQL pipe syntax (FROM t |> WHERE |> AGGREGATE): the
  linear query form; semantically identical to the nested classic query
  the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..canonical import money_sum_sql
from ..catalog import load
from ..registry import query

# ---------------------------------------------------------------------------
# fn_variant — VARIANT ingest + typed path extraction
# ---------------------------------------------------------------------------

# The CASE ladder twins try_variant_get(..., 'bigint') exactly (r14 events
# fuzz; DuckDB's bare CAST ERRORED on malformed JSON and non-numeric k):
# integral JSON numbers cast with int64-overflow -> NULL; doubles TRUNCATE
# toward zero (3.9 -> 3, -3.9 -> -3) with overflow -> NULL; booleans are
# 1/0; strings cast only when integral text (Spark's string->bigint cast
# rejects '3.9'/'0x10'/'1e3' where DuckDB's parses them — hence the
# regex gate; both trim space padding); arrays/objects/null -> NULL.
#
# Fractional literals with >15-16 SIGNIFICANT DIGITS are OUT of the
# parity contract (r15, ADVICE r14 — adjudicated like duplicate keys /
# NaN / >uint64 integers): Spark's variant parser stores them as exact
# DECIMAL(<=38) and truncates exactly (4611686018427387903.9 ->
# ...903; 9223372036854775807.5 -> int64 max), while DuckDB's
# yyjson-backed json_extract_string RE-RENDERS every DOUBLE-typed token
# through binary64 BEFORE any cast can see it ('4611686018427388000.0'
# / '9223372036854776000.0' -> ...904 / NULL) — probed r15: the raw
# token is unreachable from DuckDB's JSON layer (json_extract /
# _path_text all re-render), so no oracle expression can be
# decimal-exact and the fork is a parser-model divergence, not a cast
# bug. Double-exact fractionals (<=15 sig digits, any form) and ALL
# integral-valued forms stay fully in contract; Spark's exact-decimal
# answers for the out-of-contract shapes are pinned as known-answer
# tests (test_round15_schema_evolve.py), no-abort everywhere.
_FN_VARIANT_ORACLE = """
WITH j AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
              THEN json_extract_string(props, '$.k') END AS s,
         CASE WHEN json_valid(props)
              THEN json_type(props, '$.k') END AS t
  FROM events
),
k AS (
  SELECT event_type,
         CASE
           WHEN t IN ('BIGINT', 'UBIGINT') THEN TRY_CAST(s AS BIGINT)
           WHEN t = 'DOUBLE'
             THEN TRY_CAST(TRUNC(TRY_CAST(s AS DOUBLE)) AS BIGINT)
           WHEN t = 'BOOLEAN' THEN CASE WHEN s = 'true' THEN 1 ELSE 0 END
           WHEN t = 'VARCHAR'
                AND regexp_matches(trim(s), '^[+-]?[0-9]+$')
             THEN TRY_CAST(s AS BIGINT)
         END AS k
  FROM j
)
SELECT event_type,
       COUNT(*) AS n,
       -- TRY_CAST twins Spark's try_sum: DuckDB sums BIGINT in HUGEINT
       -- (never overflows internally) while Spark's ANSI sum aborts at
       -- int64; both now yield NULL for a group whose true sum exceeds
       -- int64 (r14 events fuzz, int64-max k values)
       TRY_CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM k
GROUP BY event_type
"""


@query("fn_variant", oracle=_FN_VARIANT_ORACLE)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT column pipeline: parse the JSON props into Spark 4's binary
    variant encoding once, then typed-path-extract with variant_get and
    aggregate. The variant parse happens a single time per row (vs
    get_json_object re-parsing the string per extraction — fn_map_json);
    at 100 TB the parsed variant also serializes columnar in shuffle
    files. DuckDB twin extracts the same path from the JSON string —
    identical values, full hash-check, including the hostile-props domain
    (r14 events fuzz): malformed JSON → NULL, typed k values follow the
    variant cast ladder the oracle comment documents. Duplicate-key
    objects are OUT of the parity contract — Spark's variant parse
    REJECTS them (NULL) where every first-wins extractor keeps a value;
    the fuzz pins no-abort only."""
    ev = load(spark, sf_dir, "events")
    # try_parse_json + try_variant_get, not the strict forms: parse_json
    # ABORTS the job on the first malformed props string and variant_get on
    # the first non-castable k (probed r12) — one dirty row in 100 TB of
    # semi-structured logs must degrade to NULL, not kill the pipeline.
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            # exact DECIMAL(38,0) sum + try_cast, not try_sum (r15, ADVICE
            # r14): try_sum NULLs when any PARTIAL sum overflows int64 —
            # partition-order-dependent for a mixed-sign group whose true
            # sum fits — while the oracle's HUGEINT-internal SUM NULLs
            # only on true-sum overflow. Summing in decimal(38,0) is exact
            # (overflow needs |sum| >= 1e38 ~ 1e19 int64-max rows), and
            # the final try_cast lands on the oracle's exact NULL
            # condition. Still one map-side-combinable agg, JVM-side.
            F.expr(
                "try_cast(sum(cast(k AS decimal(38,0))) AS bigint)"
            ).alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# udf_sql — SQL-defined scalar function (CREATE FUNCTION ... RETURN expr)
# ---------------------------------------------------------------------------

_UDF_SQL_ORACLE = """
SELECT o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                * (1 - CASE o_orderpriority WHEN '1-URGENT' THEN 0.00
                                            WHEN '2-HIGH' THEN 0.02
                                            ELSE 0.05 END)) AS DOUBLE)
         AS discounted_total
FROM orders
GROUP BY o_orderstatus
"""


@query("udf_sql", oracle=_UDF_SQL_ORACLE)
def udf_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDF (Spark 4.0 CREATE FUNCTION ... RETURN): a
    priority-tiered discount function declared in SQL and applied per row.
    The planner inlines the body into the expression tree — whole-stage
    codegen keeps running, no Python boundary, no serialization: THE way
    to package reusable business logic at 100 TB. The function does its
    arithmetic entirely in decimals (2-dp price × 2-dp rate literals —
    exact, no rounding step): round(double, 2) diverges between engines at
    representation midpoints (canonical.py §2), decimal products never
    do."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_udfsql")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION priority_discount(
            price DOUBLE, prio STRING) RETURNS DECIMAL(24,4)
        RETURN CAST(price AS DECIMAL(18,2))
               * (1 - CASE prio WHEN '1-URGENT' THEN 0.00
                                WHEN '2-HIGH' THEN 0.02
                                ELSE 0.05 END)
        """
    )
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(SUM(priority_discount(o_totalprice, o_orderpriority))
                    AS DOUBLE) AS discounted_total
        FROM orders_udfsql
        GROUP BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# sql_pipe — SQL pipe syntax (linear query form)
# ---------------------------------------------------------------------------

_SQL_PIPE_ORACLE = f"""
SELECT l_returnflag,
       {money_sum_sql('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n
FROM lineitem
WHERE l_quantity >= 30
GROUP BY l_returnflag
"""


@query("sql_pipe", oracle=_SQL_PIPE_ORACLE)
def sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0): the same filtered revenue rollup as a
    linear |> chain — scan |> WHERE |> EXTEND |> AGGREGATE ... GROUP BY.
    Pure syntax: Catalyst plans it identically to the classic nesting the
    oracle uses, and the hash-check proves exactly that."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_quantity >= 30
        |> EXTEND CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,6)) AS rev_exact
        |> AGGREGATE CAST(SUM(rev_exact) AS DOUBLE) AS revenue,
                     COUNT(*) AS n
           GROUP BY l_returnflag
        |> SELECT l_returnflag, revenue, n
        """
    )
