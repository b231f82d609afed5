"""Aggregation operators (SURVEY.md §2d).

Every aggregate here is algebraic (partial-aggregatable): Spark plans them
as HashAggregate(partial) → shuffle → HashAggregate(final), which is the
only shape that survives 100 TB. Float sums go through exact decimal
arithmetic (canonical.money_sum) so results are order- and
partitioning-independent — also what makes them DuckDB-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..canonical import (
    money_avg,
    money_avg_sql,
    money_sum,
    money_sum_sql,
)
from ..catalog import load, register_views
from ..registry import query

# ---------------------------------------------------------------------------
# agg_count — THE first recon check
# ---------------------------------------------------------------------------

_COUNT_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus
"""


@query("agg_count", oracle=_COUNT_ORACLE)
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group row counts."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# agg_basic — SUM/AVG/MIN/MAX numeric fingerprints
# ---------------------------------------------------------------------------

_BASIC_ORACLE = f"""
SELECT l_returnflag,
       {money_sum_sql('l_quantity', 'sum_qty')},
       {money_avg_sql('l_extendedprice', 'avg_price')},
       MIN(l_discount) AS min_disc,
       MAX(l_discount) AS max_disc,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


@query("agg_basic", oracle=_BASIC_ORACLE)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column numeric fingerprints: the reconciliation aggregate core."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_avg("l_extendedprice", "avg_price"),
            F.min("l_discount").alias("min_disc"),
            F.max("l_discount").alias("max_disc"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# agg_distinct — exact key-cardinality fingerprint
# ---------------------------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
"""


@query("agg_distinct", oracle=_DISTINCT_ORACLE)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — expands to two-phase agg under the hood."""
    return load(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# agg_approx — HLL cardinality (the 100-TB path), tolerance-checked oracle
# ---------------------------------------------------------------------------

_APPROX_ORACLE = """
SELECT COUNT(DISTINCT user_id) AS exact_users,
       COUNT(DISTINCT event_id) AS exact_events,
       TRUE AS users_within_tol,
       TRUE AS events_within_tol
FROM events
"""


@query("agg_approx", oracle=_APPROX_ORACLE)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): at 100 TB the exact distinct
    shuffle is the bottleneck; HLL sketches merge in constant memory.

    The sketch estimate itself is engine-specific, so the cross-engine check
    is a tolerance contract rather than value parity: the plan computes BOTH
    the HLL estimate and the exact distinct, and emits the exact counts plus
    in-plan assertions that the estimate lands within 5× the requested 2%
    rsd. The oracle's twin is the exact COUNT DISTINCT with the assertions
    expected TRUE — so a broken sketch (or a blown error bound) fails the
    hash check instead of hiding behind a rows-only entry.

    rsd is 0.02, not the r-early 0.01 (r18 optimization, guide §1.2-2 /
    §2.3): HLL++ buffer width grows ~1/rsd² — at 0.01 the aggregate
    carries 1639 long words PER COLUMN (3278 aggregate attributes in the
    plan; measured 2.1 s vs 0.69 s at 0.02 locally, and at 100 TB those
    are the bytes every partial-aggregate shuffle row carries). 0.02 keeps
    a tight bound (±10% assertion) at 1/4 the sketch width; emitted values
    are identical (exact counts + TRUE assertions)."""
    ev = load(spark, sf_dir, "events")
    # Two separate 1-row aggregates, cross-joined: mixing approx_count_
    # distinct with COUNT(DISTINCT) in ONE agg forces Spark's distinct-agg
    # Expand rewrite, which materializes a per-distinct-group HLL sketch
    # buffer (~1M sketch buffers on events) — 10× slower than the sketch
    # itself. Separated, the HLL agg is a plain constant-memory fold and
    # the exact twin is the normal expand+count plan.
    approx = ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("au"),
        F.approx_count_distinct("event_id", 0.02).alias("ae"),
    )
    exact = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.countDistinct("event_id").alias("exact_events"),
    )
    a = approx.crossJoin(exact)
    tol = F.lit(0.10)  # 5 × the 2% target rsd — deterministic at any SF
    return a.select(
        "exact_users",
        "exact_events",
        (F.abs(F.col("au") - F.col("exact_users"))
         <= tol * F.col("exact_users")).alias("users_within_tol"),
        (F.abs(F.col("ae") - F.col("exact_events"))
         <= tol * F.col("exact_events")).alias("events_within_tol"),
    )


# ---------------------------------------------------------------------------
# agg_stats — distribution fingerprint, deterministic formulation
# ---------------------------------------------------------------------------

_STATS_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND(sx / n, 6) AS mean_qty,
       ROUND(sqrt(GREATEST(sxx - sx * sx / n, 0) / (n - 1)), 6) AS stddev_qty,
       ROUND(GREATEST(sxx - sx * sx / n, 0) / (n - 1), 6) AS var_qty
FROM s
"""


@query("agg_stats", oracle=_STATS_ORACLE)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STDDEV/VARIANCE via explicit exact sums (sum x, sum x²): Spark's and
    DuckDB's native stddev use different merge orders over doubles and drift
    in the last ulps; the sum-of-squares formulation over exact decimals is
    bit-reproducible on both engines AND is the partial-aggregatable shape
    you want at scale anyway (one pass, map-side combine)."""
    q = F.col("l_quantity")
    s = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            money_sum(q, "sx"),
            money_sum(q * q, "sxx"),
        )
    )
    n = F.col("n")
    sx = F.col("sx")
    sxx = F.col("sxx")
    # try_divide: a single-row group has no sample variance — NULL, the
    # same value DuckDB's x/0→NULL convention gives the oracle; plain `/`
    # raises DIVIDE_BY_ZERO under ANSI and aborts the whole query.
    # greatest(...,0) on the NUMERATOR: the co-moment is mathematically
    # >= 0, but sxx is an exact decimal sum while sx*sx/n rounds in
    # doubles, so a zero-variance group can cancel to ~-1e-10 — Spark's
    # sqrt would return NaN where DuckDB's sqrt ERRORS outright (caught by
    # the r12 aggregate fuzz on agg_corr's identical formulation). The
    # clamp must sit INSIDE the division: greatest() ignores NULLs on both
    # engines, so clamping the quotient would turn the n=1 NULL (no sample
    # variance) into 0.0 and break the degenerate-group contract
    var = F.try_divide(F.greatest(sxx - sx * sx / n, F.lit(0.0)), n - 1)
    return s.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 6).alias("mean_qty"),
        F.round(F.sqrt(var), 6).alias("stddev_qty"),
        F.round(var, 6).alias("var_qty"),
    )


# ---------------------------------------------------------------------------
# agg_nullcount — null-profile fingerprint (on derived nulled copy)
# ---------------------------------------------------------------------------

_NULLCOUNT_ORACLE = """
WITH li AS (
  SELECT l_linestatus,
         CASE WHEN l_orderkey % 100 = 0 THEN NULL ELSE l_tax END AS l_tax
  FROM lineitem
)
SELECT l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_tax,
       COUNT(l_tax) AS n_nonnull_tax
FROM li GROUP BY l_linestatus
"""


@query("agg_nullcount", oracle=_NULLCOUNT_ORACLE)
def agg_nullcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-count fingerprint per column (fixtures are NULL-free, so the
    nulls are injected deterministically per FIXTURES.md §B.3)."""
    li = load(spark, sf_dir, "lineitem").withColumn(
        "l_tax",
        F.when(F.col("l_orderkey") % 100 == 0, F.lit(None).cast("double")).otherwise(
            F.col("l_tax")
        ),
    )
    return li.groupBy("l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("l_tax").isNull(), 1).otherwise(0)).alias("n_null_tax"),
        F.count("l_tax").alias("n_nonnull_tax"),
    )


# ---------------------------------------------------------------------------
# agg_multikey — partition-grain group-by
# ---------------------------------------------------------------------------

_MULTIKEY_ORACLE = f"""
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(month(l_shipdate) AS INT) AS ship_month,
       COUNT(*) AS n,
       {money_sum_sql('l_extendedprice', 'sum_price')}
FROM lineitem GROUP BY 1, 2
"""


@query("agg_multikey", oracle=_MULTIKEY_ORACLE)
def agg_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key group-by at the (year, month) reconciliation grain."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
        )
        .agg(F.count("*").alias("n"), money_sum("l_extendedprice", "sum_price"))
    )


# ---------------------------------------------------------------------------
# agg_having — post-aggregation filter
# ---------------------------------------------------------------------------

_HAVING_ORACLE = """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12
"""


@query("agg_having", oracle=_HAVING_ORACLE)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING: customers with more than 12 orders."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )


# ---------------------------------------------------------------------------
# agg_rollup / agg_cube / agg_gsets — grouping-set hierarchy
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT COALESCE(r.r_name, '<ALL>') AS region,
       COALESCE(n.n_name, '<ALL>') AS nation,
       COUNT(*) AS n_customers,
       {money_sum_sql('c.c_acctbal', 'sum_acctbal')}
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@query("agg_rollup", oracle=_ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP region→nation subtotal hierarchy. Grouping-null columns are
    coalesced to a sentinel so real NULLs (none here) can't alias subtotal
    rows."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), money_sum("c_acctbal", "sum_acctbal"))
        .select(
            F.coalesce("r_name", F.lit("<ALL>")).alias("region"),
            F.coalesce("n_name", F.lit("<ALL>")).alias("nation"),
            "n_customers",
            "sum_acctbal",
        )
    )


_CUBE_ORACLE = f"""
SELECT COALESCE(l_returnflag, '<ALL>') AS returnflag,
       COALESCE(l_linestatus, '<ALL>') AS linestatus,
       COUNT(*) AS n,
       {money_sum_sql('l_quantity', 'sum_qty')}
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("agg_cube", oracle=_CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping combinations of (returnflag, linestatus)."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), money_sum("l_quantity", "sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("<ALL>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<ALL>")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


_GSETS_SQL = """
SELECT COALESCE(l_returnflag, '<ALL>') AS returnflag,
       COALESCE(l_linestatus, '<ALL>') AS linestatus,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@query("agg_gsets", oracle=_GSETS_SQL)
def agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface — query text is shared
    verbatim with the DuckDB oracle (views registered under oracle names)."""
    register_views(spark, sf_dir)
    return spark.sql(_GSETS_SQL)


# ---------------------------------------------------------------------------
# agg_collect — deterministic value-set fingerprint
# ---------------------------------------------------------------------------

_COLLECT_ORACLE = """
SELECT r.r_name AS region,
       string_agg(DISTINCT n.n_name, ',' ORDER BY n.n_name) AS nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@query("agg_collect", oracle=_COLLECT_ORACLE)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sort_array → join to string: deterministic value-set
    fingerprint (bare collect_set order is partitioning-dependent)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations")
        )
    )


# ---------------------------------------------------------------------------
# agg_pivot — status × flag matrix
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = f"""
SELECT l_returnflag,
       {money_sum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END", 'qty_F')},
       {money_sum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END", 'qty_O')}
FROM lineitem GROUP BY l_returnflag
"""


@query("agg_pivot", oracle=_PIVOT_ORACLE)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns. Explicit value list ⇒ no extra
    distinct-values job and a fixed output schema (required at scale and for
    the oracle's schema check)."""
    df = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(money_sum("l_quantity", "q"))
    )
    return df.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    )


# ---------------------------------------------------------------------------
# agg_firstlast — deterministic representative row per group
# ---------------------------------------------------------------------------

# arg_min needs a totally-ordered tie-break key: epoch-days * 1e7 + orderkey
_FIRSTLAST_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         (CAST(epoch(o_orderdate) AS BIGINT) // 86400) * 10000000 + o_orderkey
           AS sort_key
  FROM orders
)
SELECT o_custkey,
       arg_min(o_orderkey, sort_key) AS first_order,
       arg_max(o_orderkey, sort_key) AS last_order,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_date,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_date
FROM o GROUP BY o_custkey
"""


@query("agg_firstlast", oracle=_FIRSTLAST_ORACLE)
def agg_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last order per customer via min_by/max_by over a totally
    ordered key (epoch-days × 1e7 + orderkey): bare first()/min_by on a
    tie-prone column is partitioning-dependent — the unique-key tie-break
    makes the survivor deterministic (SURVEY.md §7.3.4)."""
    o = load(spark, sf_dir, "orders").withColumn(
        "sort_key",
        (F.unix_timestamp("o_orderdate") / 86400).cast("bigint") * 10000000
        + F.col("o_orderkey"),
    )
    return o.groupBy("o_custkey").agg(
        F.min_by("o_orderkey", "sort_key").alias("first_order"),
        F.max_by("o_orderkey", "sort_key").alias("last_order"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_date"),
    )


# ---------------------------------------------------------------------------
# agg_corr — exact-moment Pearson correlation / covariance per group
# ---------------------------------------------------------------------------

# The co-moments are EXACT decimal sums (2-dp money inputs ⇒ 4-dp products,
# both inside DECIMAL(38,12)); only the final closed-form combination runs
# in doubles, with identical association on both engines, so corr/cov are
# bit-comparable where a native corr() aggregate (running co-moment
# updates, order-dependent) would not be. The oracle's product operands are
# DECIMAL(19,6) — one digit wider than needed — to push DuckDB onto its
# int128 multiply path (DECIMAL(18) pairs multiply in raw int64 and
# overflow on large prices); the values are identical either way.
_CORR_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
                  * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))
                  * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
                  * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       -- + 0.0: DuckDB's ROUND of a tiny NEGATIVE (e.g. -1e-9) emits
       -- -0.0 while Spark's BigDecimal round has no signed zero (r15
       -- signed-zero audit) — the add normalizes -0.0 to +0.0 and is
       -- the exact identity on every other double
       ROUND((n * sxy - sx * sy)
             / (sqrt(GREATEST(n * sxx - sx * sx, 0))
                * sqrt(GREATEST(n * syy - sy * sy, 0))), 6) + 0.0
         AS corr_qty_price,
       ROUND((n * sxy - sx * sy) / (n * (n - 1)), 6) + 0.0 AS cov_qty_price
FROM m
"""


@query("agg_corr", oracle=_CORR_ORACLE)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation and sample covariance of quantity vs price per
    returnflag, from exact decimal co-moments: Σx, Σy, Σx², Σy², Σxy are
    order-independent decimal sums (one partial-aggregatable pass), and the
    closed-form combination is a fixed double expression — unlike F.corr,
    whose streaming co-moment updates depend on partition order."""
    li = load(spark, sf_dir, "lineitem")
    dx = F.col("l_quantity").cast("decimal(18,6)")
    dy = F.col("l_extendedprice").cast("decimal(18,6)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        # try_divide: degenerate groups (n=1, or a constant column →
        # zero variance denominator) have no correlation/covariance —
        # NULL, matching DuckDB's x/0→NULL in the oracle; plain `/`
        # raises DIVIDE_BY_ZERO under ANSI. greatest(...,0) under each
        # sqrt: the co-moment is mathematically >= 0, but the exact-decimal
        # sxx/syy minus the double-rounded sx*sx/sy*sy can cancel to
        # ~-1e-10 on a zero-variance group (e.g. one 999.99 price) —
        # Spark's sqrt(neg) is NaN while DuckDB's sqrt ERRORS, so without
        # the clamp the oracle crashes where the plan silently NaNs
        # (found by the r12 aggregate fuzz)
        F.round(
            F.try_divide(
                n * sxy - sx * sy,
                F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0)))
                * F.sqrt(F.greatest(n * syy - sy * sy, F.lit(0.0))),
            ),
            6,
        ).alias("corr_qty_price"),
        F.round(F.try_divide(n * sxy - sx * sy, n * (n - 1)), 6).alias(
            "cov_qty_price"
        ),
    )


# ---------------------------------------------------------------------------
# agg_histogram — fixed-width value histogram per group
# ---------------------------------------------------------------------------

_HISTOGRAM_ORACLE = """
WITH b AS (
  SELECT event_type,
         CAST(LEAST(FLOOR(value / 50), 9) AS INT) AS bin,
         COUNT(*) AS n
  FROM events GROUP BY event_type, bin
)
SELECT event_type, bin, n,
       ROUND(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY event_type), 6) AS frac
FROM b
"""


@query("agg_histogram", oracle=_HISTOGRAM_ORACLE)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (width 50, clamped top bin) of event values
    per type — the profiling primitive behind recon_agg_drift's buckets,
    exposed as its own operator. floor-division binning is exact IEEE on
    both engines (no midpoint rule consulted); the per-type fraction is a
    window over the already-aggregated bin frame (≤ 10 rows per type), so
    the only full-data cost is one map-side-combinable count."""
    ev = load(spark, sf_dir, "events")
    b = (
        ev.select(
            "event_type",
            F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("int").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type")
    return b.select(
        "event_type",
        "bin",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias("frac"),
    )


# ---------------------------------------------------------------------------
# agg_mode — deterministic statistical mode per group
# ---------------------------------------------------------------------------

# Native mode() leaves ties unspecified on both engines; the explicit
# (count DESC, value ASC) rank pins one winner identically everywhere.
_MODE_ORACLE = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n
  FROM events GROUP BY event_type, user_id
),
r AS (
  SELECT event_type, user_id, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, user_id NULLS LAST) AS rnk
  FROM c
)
SELECT event_type,
       user_id AS modal_user,
       n AS modal_count
FROM r WHERE rnk = 1
"""


@query("agg_mode", oracle=_MODE_ORACLE)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode (most frequent value) per group with a pinned tie
    rule: native mode() picks an arbitrary winner among equal counts on
    both engines, so the canonical form is count → rank by (count DESC,
    value ASC NULLS LAST) → keep rank 1 — deterministic everywhere, and
    the rank window runs over the already-aggregated count table
    (distinct-pair sized, ≪ data). NULLS LAST is load-bearing (r14 events
    fuzz): the engines' bare-ASC defaults are OPPOSITE (Spark nulls first,
    DuckDB nulls last), so a NULL-keyed tie elected a different winner per
    engine; a group whose every key is NULL still yields NULL on both."""
    c = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("user_id").asc_nulls_last()
    )
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter("rnk = 1")
        .select(
            "event_type",
            F.col("user_id").alias("modal_user"),
            F.col("n").alias("modal_count"),
        )
    )


# ---------------------------------------------------------------------------
# agg_groupingid — grouping() / grouping_id() provenance markers (round 5)
# ---------------------------------------------------------------------------

_GROUPINGID_ORACLE = """
SELECT r_name, n_name,
       CAST(GROUPING(r_name) AS INT) AS g_region,
       CAST(GROUPING(n_name) AS INT) AS g_nation,
       CAST(GROUPING_ID(r_name, n_name) AS BIGINT) AS gid,
       COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


@query("agg_groupingid", oracle=_GROUPINGID_ORACLE)
def agg_groupingid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping()/grouping_id() over a rollup: the provenance markers that
    distinguish a real NULL group key from a subtotal row — without them a
    rollup over nullable keys is ambiguous, which is why every serious
    report generator emits them. Same integer semantics on both engines
    (bit i set = column i aggregated away)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_customers"),
        )
        .select("r_name", "n_name", "g_region", "g_nation", "gid", "n_customers")
    )


# ---------------------------------------------------------------------------
# agg_bitmap — exact distinct counts as an ALGEBRAIC bitmap aggregate
# ---------------------------------------------------------------------------

# 63-bit chunks on purpose: DuckDB range-checks (1::BIGINT << 63) where
# Spark wraps; shifts <= 62 stay positive and behave identically on both
# (the sketch_bloom word-width lesson, one bit wider).
_BITMAP_W = 63

_BITMAP_ORACLE = f"""
WITH cells AS (
  SELECT o_orderstatus,
         o_custkey // {_BITMAP_W} AS chunk,
         CAST(1 AS BIGINT) << CAST(o_custkey % {_BITMAP_W} AS INTEGER) AS mask
  FROM orders
),
words AS (
  SELECT o_orderstatus, chunk, bit_or(mask) AS w
  FROM cells GROUP BY o_orderstatus, chunk
),
bm AS (
  SELECT o_orderstatus, CAST(SUM(bit_count(w)) AS BIGINT) AS bitmap_distinct
  FROM words GROUP BY o_orderstatus
),
ex AS (
  SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_distinct
  FROM orders GROUP BY o_orderstatus
)
SELECT bm.o_orderstatus, bm.bitmap_distinct, ex.exact_distinct,
       CASE WHEN bm.bitmap_distinct = ex.exact_distinct
            THEN 'MATCH' ELSE 'DIFF' END AS verdict
FROM bm JOIN ex ON bm.o_orderstatus = ex.o_orderstatus
"""


@query("agg_bitmap", oracle=_BITMAP_ORACLE)
def agg_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting as an algebraic aggregate: key-space chunks
    of 63 keys → one int64 word per (group, chunk) built with bit_or →
    popcount-sum per group — the roaring-bitmap pattern behind
    bitmap-index distinct counts. COUNT(DISTINCT) plans an expand +
    re-shuffle on (group, key); the bitmap is a plain two-level
    HashAggregate whose partials merge with bit_or — map-side combining,
    shard/day-mergeable (union = OR), and it composes with reaggregation
    the way agg_reaggregate's decimal partials do. The exact
    COUNT(DISTINCT) rides along and the verdict column pins equality.

    At 100 TB: word count is keyspace/63 per group regardless of row
    count — dense ints (custkeys) fit; sparse/string keys would first
    densify through a dictionary join (or fall back to agg_approx)."""
    o = load(spark, sf_dir, "orders")
    cells = o.select(
        "o_orderstatus",
        F.expr(f"o_custkey DIV {_BITMAP_W}").alias("chunk"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(o_custkey % {_BITMAP_W} AS INT))"
        ).alias("mask"),
    )
    words = cells.groupBy("o_orderstatus", "chunk").agg(F.bit_or("mask").alias("w"))
    bm = words.groupBy("o_orderstatus").agg(
        F.sum(F.bit_count("w")).cast("bigint").alias("bitmap_distinct")
    )
    ex = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return bm.join(ex, "o_orderstatus").select(
        "o_orderstatus",
        "bitmap_distinct",
        "exact_distinct",
        F.when(F.col("bitmap_distinct") == F.col("exact_distinct"), "MATCH")
        .otherwise("DIFF")
        .alias("verdict"),
    )
