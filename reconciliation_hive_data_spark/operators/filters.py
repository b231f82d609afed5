"""Projection / filter / predicate operators (SURVEY.md §2b).

Design rule for 100 TB: every predicate here is expressed on raw columns
(never wrapped in UDFs or non-foldable exprs) so Catalyst pushes it into the
parquet scan — `.explain` must show PushedFilters for each of these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..canonical import dround
from ..catalog import load
from ..registry import query

# ---------------------------------------------------------------------------
# proj_compute — derived columns (net price arithmetic)
# ---------------------------------------------------------------------------

_PROJ_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)), 4)
            AS DOUBLE) AS net_price,
       CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                       AS DECIMAL(28,6)), 4) AS DOUBLE) AS gross_price
FROM lineitem
"""


@query("proj_compute", oracle=_PROJ_ORACLE)
def proj_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection: net/gross price per line item."""
    li = load(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    gross = net * (1 + F.col("l_tax"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(net, 4).alias("net_price"),
        dround(gross, 4).alias("gross_price"),
    )


# ---------------------------------------------------------------------------
# filter_pred — conjunctive/disjunctive predicates
# ---------------------------------------------------------------------------

_FILTER_PRED_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE (o_orderstatus = 'F' AND o_totalprice > 150000.0)
   OR (o_orderstatus = 'P' AND NOT o_orderpriority = '1-URGENT')
"""


@query("filter_pred", oracle=_FILTER_PRED_ORACLE)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT predicate combination, pushable to the parquet scan."""
    o = load(spark, sf_dir, "orders")
    pred = ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0)) | (
        (F.col("o_orderstatus") == "P") & ~(F.col("o_orderpriority") == "1-URGENT")
    )
    return o.filter(pred).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


# ---------------------------------------------------------------------------
# filter_in_between — membership + range predicates
# ---------------------------------------------------------------------------

_IN_BETWEEN_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A', 'R')
"""


@query("filter_in_between", oracle=_IN_BETWEEN_ORACLE)
def filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN range predicate."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20) & F.col("l_returnflag").isin("A", "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# ---------------------------------------------------------------------------
# filter_like — pattern predicates (LIKE / regex)
# ---------------------------------------------------------------------------

_LIKE_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE p_name LIKE '%red%' OR regexp_matches(p_brand, '^Brand#1[0-9]$')
"""


@query("filter_like", oracle=_LIKE_ORACLE)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and regex pattern predicates."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%red%") | F.col("p_brand").rlike("^Brand#1[0-9]$")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


# ---------------------------------------------------------------------------
# filter_nullsafe — null-safe equality (the recon compare primitive)
# ---------------------------------------------------------------------------

_NULLSAFE_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_tax,
         CASE WHEN l_orderkey % 100 = 0 THEN NULL ELSE l_tax END AS l_tax_tgt
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_tax, l_tax_tgt,
       (l_tax IS NOT DISTINCT FROM l_tax_tgt) AS same
FROM li
WHERE l_tax IS DISTINCT FROM l_tax_tgt
"""


@query("filter_nullsafe", oracle=_NULLSAFE_ORACLE)
def filter_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=>): rows where the nulled target copy differs
    from the source — plain = would silently drop the NULL rows, which is
    exactly the bug class reconciliation tools exist to catch."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_tax",
        F.when(F.col("l_orderkey") % 100 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("l_tax"))
        .alias("l_tax_tgt"),
    )
    same = F.col("l_tax").eqNullSafe(F.col("l_tax_tgt"))
    return li.withColumn("same", same).filter(~same)
