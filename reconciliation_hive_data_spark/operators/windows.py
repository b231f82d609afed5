"""Window-function operators (SURVEY.md §2e).

Scale note: every window below partitions by a key (customer/user) before
ordering — Spark shuffles once on the partition key and sorts within
partitions. An ORDER BY without PARTITION BY would serialize the whole
dataset through one task; none of these do that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..canonical import dround, ts_str
from ..catalog import load
from ..registry import query

# ---------------------------------------------------------------------------
# win_rownum — dup-ranking / top-k scaffold
# ---------------------------------------------------------------------------

_ROWNUM_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT)
         AS rn
FROM orders
"""


@query("win_rownum", oracle=_ROWNUM_ORACLE)
def win_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number per customer by price desc; orderkey tie-break makes the
    numbering total and cross-engine deterministic."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
    )


# ---------------------------------------------------------------------------
# win_rank — rank family (tie-aware)
# ---------------------------------------------------------------------------

_RANK_ORACLE = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile,
       ROUND(percent_rank() OVER w, 6) AS prnk
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
"""


@query("win_rank", oracle=_RANK_ORACLE)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile/percent_rank per market segment. rank() is
    tie-aware on the raw ordering column; ntile gets a unique tie-break so
    bucket assignment is total."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    wt = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(wt).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
    )


# ---------------------------------------------------------------------------
# win_lag — consecutive-event deltas
# ---------------------------------------------------------------------------

_LAG_ORACLE = """
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       event_type,
       lag(event_type) OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       CAST(COALESCE(epoch(date_trunc('second', ts))
                     - epoch(date_trunc('second', lag(ts) OVER w)), -1) AS BIGINT)
         AS secs_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("win_lag", oracle=_LAG_ORACLE)
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event timeline + inter-event gap seconds.
    epoch() in DuckDB returns fractional seconds for µs timestamps; Spark's
    unix_timestamp truncates — both sides subtract whole-second epochs after
    the same µs truncation, then the difference is floored identically via
    epoch-of-truncated-ts."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    prev_epoch = F.unix_timestamp(F.date_trunc("second", F.lag("ts").over(w)))
    return ev.select(
        "event_id",
        "user_id",
        ts_str("ts", "ts_s"),
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.coalesce(epoch_s - prev_epoch, F.lit(-1)).cast("bigint").alias(
            "secs_since_prev"
        ),
    )


# ---------------------------------------------------------------------------
# win_running — cumulative aggregate
# ---------------------------------------------------------------------------

_RUNNING_ORACLE = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_value,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS running_n
FROM events
"""


@query("win_running", oracle=_RUNNING_ORACLE)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum/count per user. The sum runs in exact decimal: a
    running double sum would accumulate engine-order-specific rounding."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias(
            "running_value"
        ),
        F.count("*").over(w).cast("bigint").alias("running_n"),
    )


# ---------------------------------------------------------------------------
# win_moving — sliding frame
# ---------------------------------------------------------------------------

_MOVING_ORACLE = """
SELECT event_id, user_id, value,
       CAST(ROUND(CAST(
         CAST(SUM(CAST(value AS DECIMAL(18,6)))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS DECIMAL(28,6)), 4) AS DOUBLE) AS moving_avg3
FROM events
"""


@query("win_moving", oracle=_MOVING_ORACLE)
def win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per user (exact decimal sum / frame count)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    msum = F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
    mcnt = F.count("*").over(w)
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        dround(msum / mcnt, 4).alias("moving_avg3"),
    )


# ---------------------------------------------------------------------------
# win_range — value-range frame (trailing 1 hour by timestamp)
# ---------------------------------------------------------------------------

_RANGE_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, value,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec,
         ts, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6)))
            OVER (PARTITION BY user_id ORDER BY ts_sec
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS sum_trailing_1h,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_sec
                           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_trailing_1h
FROM e
"""


@query("win_range", oracle=_RANGE_ORACLE)
def win_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: trailing-1-hour sum/count per user over epoch-second
    ordering. RANGE frames need a numeric ordering key on both engines, so
    the timestamp goes through the same second-truncation first. Note: ties
    on ts_sec share a frame (RANGE semantics) — identical on both engines."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_sec", F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias(
            "sum_trailing_1h"
        ),
        F.count("*").over(w).cast("bigint").alias("n_trailing_1h"),
    )


# ---------------------------------------------------------------------------
# win_firstlast — first/last over an explicit frame
# ---------------------------------------------------------------------------

_WFIRSTLAST_ORACLE = """
SELECT event_id, user_id, event_type,
       first_value(event_type) OVER w AS user_first_type,
       last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND UNBOUNDED FOLLOWING)
         AS user_last_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@query("win_firstlast", oracle=_WFIRSTLAST_ORACLE)
def win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's first/last event type. The frame is explicitly unbounded:
    last_value over the default frame (… AND CURRENT ROW) is the classic
    silent-wrong-answer; the total (ts, event_id) ordering makes first/last
    deterministic."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.first("event_type").over(w).alias("user_first_type"),
        F.last("event_type").over(w).alias("user_last_type"),
    )


# ---------------------------------------------------------------------------
# win_distribution — ntile / percent_rank / cume_dist
# ---------------------------------------------------------------------------

_WDIST_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume
FROM orders
-- NULLS LAST pinned (r14 ASC-null-order audit): the engines' bare-ASC
-- defaults are OPPOSITE (Spark nulls first, DuckDB nulls last), so one
-- NULL-priced order would shift every quartile/pct_rank/cume in its
-- status partition
WINDOW w AS (PARTITION BY o_orderstatus
             ORDER BY o_totalprice NULLS LAST, o_orderkey)
"""


@query("win_ntile", oracle=_WDIST_ORACLE)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile assignment (ntile), relative
    rank, and cumulative distribution per order-status partition. The
    (o_totalprice, o_orderkey) ordering is total, so bucket boundaries and
    ranks are deterministic; the ratios are single int/int divisions —
    bit-identical cross-engine. ntile's extra-row rule (earlier buckets get
    the remainder) is the SQL-standard one on both engines. NULLS LAST on
    the price is load-bearing (r14 ASC-null-order audit): this was the one
    window in §2e ordering ASC on a NULLABLE column, and the engines'
    bare-ASC NULL defaults are opposite."""
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc_nulls_last(), "o_orderkey"
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
