"""Sort / limit / top-k operators (SURVEY.md §2f).

Scale note: a global ORDER BY is a range-partitioned shuffle (sampled
boundaries) — fine. ORDER BY + LIMIT k is better: Spark plans TakeOrderedAndProject,
which keeps only k rows per partition and merges on the driver — no global
sort materialization. Per-group top-k goes through a window, shuffling once
on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import query

# ---------------------------------------------------------------------------
# sort_multi — multi-column sort with NULLS FIRST/LAST
# ---------------------------------------------------------------------------

_SORT_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_totalprice END
           AS o_totalprice
  FROM orders
)
SELECT o_orderkey, o_orderstatus, o_totalprice,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC NULLS LAST,
                               o_orderstatus ASC, o_orderkey ASC) AS BIGINT)
         AS sort_pos
FROM o
"""


@query("sort_multi", oracle=_SORT_ORACLE)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with explicit NULLS LAST (nulls injected since the
    fixtures have none). The oracle's value-hash is order-insensitive, so
    the sort position is materialized as a column — that makes the ordering
    itself part of the checked values."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 100 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    w = Window.orderBy(
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderstatus").asc(),
        F.col("o_orderkey").asc(),
    )
    return o.withColumn("sort_pos", F.row_number().over(w).cast("bigint"))


# ---------------------------------------------------------------------------
# limit_topk — global top-k
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@query("limit_topk", oracle=_TOPK_ORACLE)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 by price; unique-key tie-break ⇒ a deterministic set.
    Plans as TakeOrderedAndProject (per-partition heap of 25, no full sort)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# topk_pergroup — classic window + filter
# ---------------------------------------------------------------------------

_TOPK_GROUP_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey)
              AS BIGINT) AS rn
  FROM orders
) WHERE rn <= 3
"""


@query("topk_pergroup", oracle=_TOPK_GROUP_ORACLE)
def topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: one shuffle on the group key, rank, filter.
    The rank filter is pushed below the window's sort output — no second
    shuffle."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
    )
