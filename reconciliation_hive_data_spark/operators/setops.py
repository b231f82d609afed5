"""Set operators (SURVEY.md §2g): UNION [ALL], EXCEPT [ALL], INTERSECT [ALL],
and dedup — the row-level reconciliation primitives (EXCEPT ALL of source vs
target IS the row-diff report).

Derived inputs: the fixtures have no duplicate rows, so the perturbed/
duplicated copies are built in-query from key arithmetic, identically on
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import query

# Perturbed copy of orders for EXCEPT/INTERSECT: totalprice drifted on
# o_orderkey % 500 == 3 (30 rows at sf0.01).
_PERTURB_CTE = """
WITH orders_b AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 500 = 3 THEN o_totalprice + 0.01
              ELSE o_totalprice END AS o_totalprice
  FROM orders
),
orders_a AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
)
"""


def _orders_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _orders_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 500 == 3, F.col("o_totalprice") + 0.01)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )


# ---------------------------------------------------------------------------
# set_union — UNION ALL + UNION DISTINCT
# ---------------------------------------------------------------------------

_UNION_ORACLE = """
WITH lo AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0),
     hi AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 1),
     overlap AS (SELECT o_orderkey, o_orderstatus FROM orders
                 WHERE o_orderkey % 10 = 0)
SELECT o_orderkey, o_orderstatus, COUNT(*) AS copies FROM (
  SELECT * FROM lo UNION ALL SELECT * FROM hi UNION ALL SELECT * FROM overlap
) GROUP BY o_orderkey, o_orderstatus
"""


@query("set_union", oracle=_UNION_ORACLE)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of key-split halves plus an overlapping slice; the copies
    count proves ALL semantics (overlap rows appear twice). unionByName, not
    positional union — column order is not a contract."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    lo = o.filter(F.col("o_orderkey") % 2 == 0)
    hi = o.filter(F.col("o_orderkey") % 2 == 1)
    overlap = o.filter(F.col("o_orderkey") % 10 == 0)
    return (
        lo.unionByName(hi)
        .unionByName(overlap)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(F.count("*").alias("copies"))
    )


# ---------------------------------------------------------------------------
# set_except — EXCEPT ALL (full-row diff, THE recon row-compare)
# ---------------------------------------------------------------------------

_EXCEPT_ORACLE = _PERTURB_CTE + """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders_a EXCEPT ALL SELECT * FROM orders_b
"""


@query("set_except", oracle=_EXCEPT_ORACLE)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL source-vs-perturbed-target: exactly the drifted rows
    survive. This is the whole-row diff a reconciliation report is built
    from when no key is trusted."""
    return _orders_a(spark, sf_dir).exceptAll(_orders_b(spark, sf_dir))


# ---------------------------------------------------------------------------
# set_intersect — INTERSECT ALL
# ---------------------------------------------------------------------------

_INTERSECT_ORACLE = _PERTURB_CTE + """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders_a INTERSECT ALL SELECT * FROM orders_b
"""


@query("set_intersect", oracle=_INTERSECT_ORACLE)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: rows identical on both sides (everything except the
    drifted keys)."""
    return _orders_a(spark, sf_dir).intersectAll(_orders_b(spark, sf_dir))


# ---------------------------------------------------------------------------
# set_dedup — dropDuplicates with a deterministic survivor
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = """
WITH dups AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  UNION ALL
  SELECT o_orderkey + 1000000 AS o_orderkey, o_custkey, o_totalprice
  FROM orders WHERE o_orderkey % 20 = 0
)
SELECT o_custkey, o_totalprice, o_orderkey AS survivor_key FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey, o_totalprice
                               ORDER BY o_orderkey) AS rn
  FROM dups
) WHERE rn = 1
"""


@query("set_dedup", oracle=_DEDUP_ORACLE)
def set_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset dedup with a deterministic survivor (min key). Spark's
    dropDuplicates keeps an arbitrary row — fine for semantics, unusable for
    cross-engine checks — so the row_number()==1 form is the canonical
    dedup in this engine (SURVEY.md §7.3.4); it also broadcasts no state and
    shuffles once on the dedup key at scale."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    # single-scan dup injection (r18, guide §2.4 — the documents_dup class):
    # the %20 echo rows ride an explode instead of a second filtered scan
    offs = (
        F.when(F.col("o_orderkey") % 20 == 0, F.array(F.lit(0), F.lit(1000000)))
        .otherwise(F.array(F.lit(0)))
    )
    dups = (
        o.withColumn("_off", F.explode(offs))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_off"))
        .drop("_off")
    )
    w = Window.partitionBy("o_custkey", "o_totalprice").orderBy("o_orderkey")
    return (
        dups.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("o_custkey", "o_totalprice", F.col("o_orderkey").alias("survivor_key"))
    )


# ---------------------------------------------------------------------------
# set_bagops — multiset INTERSECT ALL / EXCEPT ALL
# ---------------------------------------------------------------------------

_BAGOPS_ORACLE = """
WITH a AS (
  SELECT user_id, event_type FROM events WHERE value > 100
),
b AS (
  SELECT user_id, event_type FROM events
  WHERE event_type IN ('view', 'click')
)
SELECT 'intersect_all' AS op, user_id, event_type
FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
UNION ALL
SELECT 'except_all' AS op, user_id, event_type
FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
"""


@query("set_bagops", oracle=_BAGOPS_ORACLE)
def set_bagops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) set operations: INTERSECT ALL keeps min(countA,
    countB) copies of each row, EXCEPT ALL keeps countA - countB — the
    semantics dedup-sensitive reconciliation needs when duplicate rows are
    themselves the signal (set_union/set_except cover the DISTINCT forms).
    Spark implements both as a single count-compare aggregate under the
    hood — one shuffle on the full row, same as the DISTINCT variants."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 100).select("user_id", "event_type")
    b = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_type"
    )
    return (
        a.intersectAll(b)
        .select(F.lit("intersect_all").alias("op"), "user_id", "event_type")
        .unionByName(
            a.exceptAll(b).select(
                F.lit("except_all").alias("op"), "user_id", "event_type"
            )
        )
    )
