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

_FN_VARIANT_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
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
    identical values, full hash-check."""
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
            F.sum("k").alias("sum_k"),
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
