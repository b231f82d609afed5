"""Mergeable probabilistic sketches, md5-derived for cross-engine exactness.

Three sketch operators with the associative-merge shape that matters at
100 TB (each partition builds a partial sketch; partials merge with
bit_or / sum / max — all algebraic, all map-side-combining):

- ``sketch_bloom`` — an 8192-bit / 4-hash Bloom filter over the orders
  customer set, probed by the customer dimension. The filter is 256
  32-bit words built with ``bit_or`` — the membership pre-filter that
  replaces a full anti-join when the key set fits in a few KB per
  executor. (Words are 32-bit on purpose: DuckDB range-checks 1<<63
  where Spark wraps; shifts <= 31 behave identically on both.)
- ``sketch_cms`` — a depth-4 × width-256 count-min sketch of per-user
  event counts. Point estimates = min over rows; overestimates only —
  the heavy-hitter / frequency primitive when exact per-key counts would
  shuffle the world.
- ``sketch_hll`` — a 64-register HyperLogLog-style distinct estimator
  (register max of md5-bit-run lengths). The register table merges with
  MAX; the raw-estimate harmonic sum is evaluated by an ORDERED fold over
  the 64 registers so both engines add the same doubles in the same order.

Unlike the built-in approx aggregates (HLL++/CountMinSketch in Spark,
approx_count_distinct in DuckDB — implementation-defined, hence
``agg_approx`` is rows-only), these derive every hash from md5 shared by
both engines, so row counts, schemas AND values hash-match: the sketches
themselves are the verified artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

# ---------------------------------------------------------------------------
# sketch_bloom — 8192-bit / 4-hash Bloom filter, built + probed
# ---------------------------------------------------------------------------

_BLOOM_BITS = 8192
_BLOOM_HASHES = 4


def _bloom_pos_spark(key, i: int):
    """Bit position of hash i for a (string-cast) key — md5-derived."""
    h = F.md5(F.concat_ws(":", F.lit(str(i)), key.cast("string")))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % _BLOOM_BITS)


def _bloom_pos_sql(key: str, i: int) -> str:
    return (
        f"(('0x' || substr(md5('{i}:' || CAST({key} AS VARCHAR)), 1, 4))::BIGINT"
        f" % {_BLOOM_BITS})"
    )


_BLOOM_ORACLE = f"""
WITH keys AS (SELECT DISTINCT o_custkey FROM orders),
bits AS (
  SELECT {_bloom_pos_sql('o_custkey', 0)} AS pos FROM keys
  UNION ALL SELECT {_bloom_pos_sql('o_custkey', 1)} FROM keys
  UNION ALL SELECT {_bloom_pos_sql('o_custkey', 2)} FROM keys
  UNION ALL SELECT {_bloom_pos_sql('o_custkey', 3)} FROM keys
),
bloom AS (
  SELECT pos // 32 AS word, bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS w
  FROM bits GROUP BY pos // 32
),
probes AS (
  SELECT c_custkey,
         {_bloom_pos_sql('c_custkey', 0)} AS p0,
         {_bloom_pos_sql('c_custkey', 1)} AS p1,
         {_bloom_pos_sql('c_custkey', 2)} AS p2,
         {_bloom_pos_sql('c_custkey', 3)} AS p3
  FROM customer
),
checked AS (
  SELECT c_custkey,
         (COALESCE((b0.w >> CAST(p0 % 32 AS INTEGER)) & 1, 0) = 1 AND
          COALESCE((b1.w >> CAST(p1 % 32 AS INTEGER)) & 1, 0) = 1 AND
          COALESCE((b2.w >> CAST(p2 % 32 AS INTEGER)) & 1, 0) = 1 AND
          COALESCE((b3.w >> CAST(p3 % 32 AS INTEGER)) & 1, 0) = 1) AS maybe,
         EXISTS (SELECT 1 FROM keys k WHERE k.o_custkey = c_custkey) AS actual
  FROM probes
  LEFT JOIN bloom b0 ON b0.word = p0 // 32
  LEFT JOIN bloom b1 ON b1.word = p1 // 32
  LEFT JOIN bloom b2 ON b2.word = p2 // 32
  LEFT JOIN bloom b3 ON b3.word = p3 // 32
)
SELECT CASE WHEN maybe AND actual THEN 'TRUE_POSITIVE'
            WHEN maybe AND NOT actual THEN 'FALSE_POSITIVE'
            ELSE 'TRUE_NEGATIVE' END AS verdict,
       COUNT(*) AS n
FROM checked GROUP BY 1
"""


@query("sketch_bloom", oracle=_BLOOM_ORACLE)
def sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-filter: build an 8192-bit / 4-hash
    filter over the ordering-customer key set (256 32-bit words via
    bit_or — associative, partials merge for free), probe every customer,
    and cross-check against true membership: TRUE_POSITIVE /
    FALSE_POSITIVE / TRUE_NEGATIVE counts. No false negatives by
    construction — the invariant the pre-filter use case (skip the big
    join for definite non-members) rests on. The md5-derived positions
    make filter and verdicts bit-identical on both engines.

    At 100 TB: the 1 KB filter broadcasts; the probe is a narrow map. The
    word-table formulation (vs a single array) keeps the build a plain
    groupBy(word) — no driver-side aggregation, unlike
    DataFrame.stat.bloomFilter which collects to the driver."""
    keys = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().localCheckpoint()
    )
    bits = None
    for i in range(_BLOOM_HASHES):
        part = keys.select(_bloom_pos_spark(F.col("o_custkey"), i).alias("pos"))
        bits = part if bits is None else bits.unionAll(part)
    bloom = (
        bits.withColumn("word", (F.col("pos") / 32).cast("bigint"))
        .withColumn("bit", (F.col("pos") % 32).cast("int"))
        .groupBy("word")
        # F.shiftleft requires a literal shift amount; the SQL form takes a column
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("w"))
    )
    probes = load(spark, sf_dir, "customer").select(
        "c_custkey",
        *[
            _bloom_pos_spark(F.col("c_custkey"), i).alias(f"p{i}")
            for i in range(_BLOOM_HASHES)
        ],
    )
    checked = probes
    maybe = F.lit(True)
    for i in range(_BLOOM_HASHES):
        b = bloom.select(
            F.col("word").alias(f"word{i}"), F.col("w").alias(f"w{i}")
        )
        checked = checked.join(
            F.broadcast(b),
            (F.col(f"p{i}") / 32).cast("bigint") == F.col(f"word{i}"),
            "left",
        )
        bit_set = F.expr(f"(shiftright(w{i}, CAST(p{i} % 32 AS INT)) & 1) = 1")
        maybe = maybe & F.coalesce(bit_set, F.lit(False))
    # true membership comes from the SAME checkpointed distinct-key frame
    # the filter was built from (r19, guide §2.4 — the pre-r19 spelling
    # re-scanned orders and re-ran the distinct exchange for it)
    actual = keys.select(F.col("o_custkey").alias("c_custkey"))
    checked = checked.withColumn("maybe", maybe).join(
        actual.withColumn("actual", F.lit(True)), "c_custkey", "left"
    )
    return (
        checked.withColumn("actual", F.coalesce("actual", F.lit(False)))
        .select(
            F.when(F.col("maybe") & F.col("actual"), "TRUE_POSITIVE")
            .when(F.col("maybe") & ~F.col("actual"), "FALSE_POSITIVE")
            .otherwise("TRUE_NEGATIVE")
            .alias("verdict")
        )
        .groupBy("verdict")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# sketch_cms — depth-4 × width-256 count-min sketch of per-user event counts
# ---------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 256


def _cms_pos_sql(key: str, d: int) -> str:
    return (
        f"(('0x' || substr(md5('{d}:' || CAST({key} AS VARCHAR)), 1, 4))::BIGINT"
        f" % {_CMS_WIDTH})"
    )


_CMS_ORACLE = f"""
WITH rows_exploded AS (
  SELECT d.d AS d,
         CASE d.d
           WHEN 0 THEN {_cms_pos_sql('user_id', 0)}
           WHEN 1 THEN {_cms_pos_sql('user_id', 1)}
           WHEN 2 THEN {_cms_pos_sql('user_id', 2)}
           ELSE {_cms_pos_sql('user_id', 3)}
         END AS pos
  FROM events CROSS JOIN (SELECT unnest(range(0, {_CMS_DEPTH})) AS d) d
),
cms AS (SELECT d, pos, COUNT(*) AS cnt FROM rows_exploded GROUP BY d, pos),
probe_keys AS (SELECT DISTINCT user_id FROM events WHERE user_id < 100),
probe_pos AS (
  SELECT user_id, d.d AS d,
         CASE d.d
           WHEN 0 THEN {_cms_pos_sql('user_id', 0)}
           WHEN 1 THEN {_cms_pos_sql('user_id', 1)}
           WHEN 2 THEN {_cms_pos_sql('user_id', 2)}
           ELSE {_cms_pos_sql('user_id', 3)}
         END AS pos
  FROM probe_keys CROSS JOIN (SELECT unnest(range(0, {_CMS_DEPTH})) AS d) d
),
est AS (
  SELECT p.user_id, MIN(c.cnt) AS est_count
  FROM probe_pos p JOIN cms c ON c.d = p.d AND c.pos = p.pos
  GROUP BY p.user_id
),
actual AS (
  SELECT user_id, COUNT(*) AS true_count FROM events
  WHERE user_id < 100 GROUP BY user_id
)
SELECT e.user_id, e.est_count, a.true_count
FROM est e JOIN actual a ON a.user_id = e.user_id
"""


@query("sketch_cms", oracle=_CMS_ORACLE)
def sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of per-user event counts (depth 4 × width 256,
    md5-derived row hashes), probed for every user_id < 100 and reported
    against the exact count. est >= true always; the gap measures
    collision pressure at this width — the sketch table (<=1024 rows)
    replaces a full per-key count when keys are legion and only heavy
    hitters matter. Build is one explode(×4) + groupBy — partial sketches
    from different partitions merge by summing cells. Identical md5
    positions both engines ⇒ identical estimates, full hash-check."""
    ev = load(spark, sf_dir, "events")
    d = F.explode(F.sequence(F.lit(0), F.lit(_CMS_DEPTH - 1))).alias("d")
    pos = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("d"), F.col("user_id").cast("string"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % _CMS_WIDTH
    )
    cms = (
        ev.select("user_id", d)
        .withColumn("pos", pos)
        .groupBy("d", "pos")
        .agg(F.count("*").alias("cnt"))
    )
    # probe list and exact calibration from ONE filtered aggregate (r19,
    # guide §2.4): the probed users' true counts ride the same groupBy
    # that used to run twice (distinct for probes + count for actual) —
    # 3 scans → 2; the remaining two passes (full-table sketch build,
    # probed-slice calibration) are the algorithm's floor.
    base = (
        ev.filter(F.col("user_id") < 100)
        .groupBy("user_id")
        .agg(F.count("*").alias("true_count"))
    )
    probes = base.select("user_id", "true_count", d).withColumn("pos", pos)
    return (
        probes.join(F.broadcast(cms), ["d", "pos"])
        .groupBy("user_id", "true_count")
        .agg(F.min("cnt").alias("est_count"))
        .select("user_id", "est_count", "true_count")
    )


# ---------------------------------------------------------------------------
# sketch_hll — 64-register HLL-style distinct estimator (md5 bit runs)
# ---------------------------------------------------------------------------

_HLL_M = 64
_HLL_ALPHA = 0.709  # alpha_64 from the HLL paper (0.7213 / (1 + 1.079/m))

_HLL_ORACLE = f"""
WITH hashed AS (
  SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 2))::BIGINT
           % {_HLL_M} AS reg,
         ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 3, 12))::BIGINT AS v
  FROM lineitem
),
rho AS (
  SELECT reg,
         MAX(CASE WHEN v = 0 THEN 49 ELSE 48 - length(bin(v)) + 1 END) AS max_rho
  FROM hashed GROUP BY reg
),
regs AS (
  SELECT g.reg, COALESCE(r.max_rho, 0) AS max_rho
  FROM (SELECT unnest(range(0, {_HLL_M})) AS reg) g
  LEFT JOIN rho r ON r.reg = g.reg
),
folded AS (
  SELECT list_reduce(
           list(pow(2.0, -CAST(max_rho AS DOUBLE)) ORDER BY reg),
           (x, y) -> x + y
         ) AS z,
         COUNT(CASE WHEN max_rho > 0 THEN 1 END) AS n_populated
  FROM regs
),
exact AS (SELECT COUNT(DISTINCT l_partkey) AS exact_distinct FROM lineitem)
SELECT CAST({_HLL_M} AS BIGINT) AS m,
       n_populated,
       {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / z AS raw_estimate,
       exact_distinct
FROM folded CROSS JOIN exact
"""


@query("sketch_hll", oracle=_HLL_ORACLE)
def sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog-style distinct estimate of lineitem part keys with 64
    registers: register = md5[0:2] % 64, rho = leading-zero run (+1) of
    the next 48 md5 bits, computed INTEGER-ONLY via the binary-string
    length (no float log2 — engines could round differently at powers of
    two). Registers merge with MAX (the mergeable-sketch property); the
    harmonic sum folds the 64 per-register doubles in register order on
    both engines (sorted fold — the x_domain_mix normalizer pattern), so
    the raw estimate is bit-identical cross-engine — and is emitted RAW,
    not rounded: engine-native ROUND on an arbitrary real is the one
    midpoint-divergence class canonical.py §2 forbids (dround is
    money-class-only), and identical inputs + identical double arithmetic
    already make the unrounded value deterministic. Reported beside the
    exact distinct count; no small/large-range bias correction — this
    pins the sketch shape, agg_approx carries the production HLL++.

    At 100 TB: one narrow map + a 64-group MAX aggregate; the register
    table is bytes-sized and merges across days/shards by the same MAX.

    Single-pass shape (r19, guide §2.4): the exact-calibration
    COUNT(DISTINCT) no longer runs its own scan + distinct expand — the
    sketch is computed over the DISTINCT key set (duplicates cannot
    change a per-register MAX, since rho is a pure function of the key),
    so each register's aggregate also carries its distinct-key count and
    the exact total is their sum. 2 scans → 1, one distinct exchange
    instead of a distinct expand + a second full pass."""
    li = load(spark, sf_dir, "lineitem")
    h = F.md5(F.col("l_partkey").cast("string"))
    hashed = (
        li.select("l_partkey")
        .distinct()
        .select(
            (F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint") % _HLL_M).alias(
                "reg"
            ),
            F.conv(F.substring(h, 3, 12), 16, 10).cast("bigint").alias("v"),
        )
    )
    rho = hashed.groupBy("reg").agg(
        F.max(
            F.when(F.col("v") == 0, 49).otherwise(
                48 - F.length(F.conv(F.col("v"), 10, 2)) + 1
            )
        ).alias("max_rho"),
        F.count("*").alias("nk"),
    )
    grid = spark.range(_HLL_M).select(F.col("id").alias("reg"))
    regs = grid.join(rho, "reg", "left").select(
        "reg",
        F.coalesce("max_rho", F.lit(0)).alias("max_rho"),
        F.coalesce("nk", F.lit(0)).alias("nk"),
    )
    folded = regs.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("reg", "max_rho"))),
                lambda s: F.pow(F.lit(2.0), -s.max_rho.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("z"),
        F.count(F.when(F.col("max_rho") > 0, 1)).alias("n_populated"),
        F.sum("nk").alias("exact_distinct"),
    )
    return folded.select(
        F.lit(_HLL_M).cast("bigint").alias("m"),
        "n_populated",
        (F.lit(_HLL_ALPHA) * _HLL_M * _HLL_M / F.col("z")).alias("raw_estimate"),
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# sketch_kmv — k-minimum-values (theta-family) distinct + intersection
# ---------------------------------------------------------------------------

_KMV_K = 64
# 2^48 — the md5-derived hash domain (12 hex chars), as an exact double
_KMV_DOMAIN = "281474976710656.0"


def _kmv_hash_sql(key: str) -> str:
    return f"('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 12))::BIGINT"


def _kmv_est_sql(cnt: str, tau: str) -> str:
    """KMV estimator (k-1)/U_(k) with U = h/2^48, written so both engines
    evaluate the identical double expression."""
    return f"(CAST({cnt} AS DOUBLE) - 1.0) * {_KMV_DOMAIN} / CAST({tau} AS DOUBLE)"


# NULL custkeys are excluded from the key-set universe everywhere
# (r14 ASC-null-order audit): a NULL key hashes to NULL, and the
# engines' ASC defaults put it at OPPOSITE ends of the k-smallest sort
# (Spark first — displacing a real hash from the sketch — DuckDB last);
# a KMV sketch is defined over keys, and NULL is not a key, exactly as
# COUNT(DISTINCT) already treats it in the exact calibration columns.
_KMV_ORACLE = f"""
WITH a AS (
  SELECT DISTINCT {_kmv_hash_sql('o_custkey')} AS h
  FROM orders WHERE o_orderstatus = 'O' AND o_custkey IS NOT NULL
),
b AS (
  SELECT DISTINCT {_kmv_hash_sql('o_custkey')} AS h
  FROM orders WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL
),
u AS (SELECT h FROM a UNION SELECT h FROM b),
ka AS (SELECT MAX(h) AS tau, COUNT(*) AS c
       FROM (SELECT h FROM a ORDER BY h LIMIT {_KMV_K})),
kb AS (SELECT MAX(h) AS tau, COUNT(*) AS c
       FROM (SELECT h FROM b ORDER BY h LIMIT {_KMV_K})),
ku AS (SELECT MAX(h) AS tau, COUNT(*) AS c
       FROM (SELECT h FROM u ORDER BY h LIMIT {_KMV_K})),
ex AS (
  SELECT COUNT(DISTINCT CASE WHEN o_orderstatus = 'O' THEN o_custkey END)
           AS exact_a,
         COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END)
           AS exact_b
  FROM orders
),
exi AS (
  SELECT COUNT(*) AS exact_inter FROM (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderstatus = 'O' AND o_custkey IS NOT NULL
    INTERSECT
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL
  )
)
SELECT CAST({_KMV_K} AS BIGINT) AS k,
       {_kmv_est_sql('ka.c', 'ka.tau')} AS est_a,
       {_kmv_est_sql('kb.c', 'kb.tau')} AS est_b,
       {_kmv_est_sql('ku.c', 'ku.tau')} AS est_union,
       {_kmv_est_sql('ka.c', 'ka.tau')} + {_kmv_est_sql('kb.c', 'kb.tau')}
         - {_kmv_est_sql('ku.c', 'ku.tau')} AS est_inter,
       ex.exact_a, ex.exact_b, exi.exact_inter
FROM ka CROSS JOIN kb CROSS JOIN ku CROSS JOIN ex CROSS JOIN exi
"""


@query("sketch_kmv", oracle=_KMV_ORACLE)
def sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values sketch (theta-sketch family, k=64): distinct
    estimates for two customer key sets (open vs fulfilled orders), their
    union via the merged sketch, and the intersection by
    inclusion-exclusion — the set-operation capability HLL lacks (you
    cannot intersect HLLs; you CAN intersect KMVs, which is why theta
    sketches exist). Hashes are md5-derived 48-bit ints (sketch_hll's
    recipe) so the whole artifact is hash-verified; the estimator
    (k-1)/U_(k) is one double expression over identical ints. Exact
    distincts + exact intersection ride along for calibration.

    Single-pass shape (r19, guide §2.4 — VERDICT r18 item 5): the pre-r19
    plan re-inlined the distinct-hash subtree at its six consumer sites
    (three TakeOrdered sketches, two exact distincts, the intersect) — 7
    parquet scans / 9 exchanges; column pruning differentiates the
    subtrees, so runtime exchange reuse never fires (probed r19), and
    persisting them measured 1.8× slower (r18 negative result). Now ONE
    scan feeds ONE per-hash aggregate H (side membership flags + per-side
    exact key counts), one global cumulative window over H derives every
    per-side k-th-smallest order statistic, and one final aggregate emits
    all eight outputs — bit-identical to the TakeOrdered spelling
    (verified row-for-row, and pinned in tests/test_round19_opt.py).

    At 100 TB the window's global ordering needs the standard exact
    refinement this fixture-scale plan omits (H here is a metadata-sized
    distinct-customer table): aggregate H once more into 2^12 h-prefix
    buckets of per-side counts, take each side's covering-prefix bound
    from the cumulative bucket counts (a 4096-row window), and pre-filter
    H to h below the per-side bounds before the ordered window — every
    true top-k candidate provably survives, and the window input shrinks
    to O(k · buckets). Sketch MERGE composition is unchanged: per-shard
    sketches still union value lists and re-truncate to k without
    touching raw keys."""
    # NULL custkeys are not keys (r14 audit — see the oracle comment):
    # without this filter a NULL hash would occupy a sketch slot here
    # (NULL never enters DuckDB's k-smallest) and skew the union tier.
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .filter(F.col("o_orderstatus").isin("O", "F"))
    )
    h = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    hh = (
        o.select(
            F.col("o_orderstatus").alias("st"),
            F.col("o_custkey").alias("ck"),
            h.alias("h"),
        )
        .groupBy("h")
        .agg(
            F.max(F.col("st") == "O").alias("in_a"),
            F.max(F.col("st") == "F").alias("in_b"),
            # per-hash distinct KEY counts: summed, they are the exact
            # per-side COUNT(DISTINCT custkey) even under md5 collisions
            # (each custkey lands in exactly one hash group)
            F.countDistinct(F.when(F.col("st") == "O", F.col("ck"))).alias(
                "nk_a"
            ),
            F.countDistinct(F.when(F.col("st") == "F", F.col("ck"))).alias(
                "nk_b"
            ),
        )
    )
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hh.select(
        "h",
        "in_a",
        "in_b",
        "nk_a",
        "nk_b",
        F.sum(F.col("in_a").cast("int")).over(w).alias("ca"),
        F.sum(F.col("in_b").cast("int")).over(w).alias("cb"),
        F.sum(F.lit(1)).over(w).alias("cu"),
    )
    k = F.lit(_KMV_K)
    agg = cum.agg(
        F.max(F.when(F.col("in_a") & (F.col("ca") <= k), F.col("h"))).alias("tau_a"),
        F.coalesce(
            F.max(F.when(F.col("in_a") & (F.col("ca") <= k), F.col("ca"))), F.lit(0)
        ).alias("c_a"),
        F.max(F.when(F.col("in_b") & (F.col("cb") <= k), F.col("h"))).alias("tau_b"),
        F.coalesce(
            F.max(F.when(F.col("in_b") & (F.col("cb") <= k), F.col("cb"))), F.lit(0)
        ).alias("c_b"),
        F.max(F.when(F.col("cu") <= k, F.col("h"))).alias("tau_u"),
        F.coalesce(F.max(F.when(F.col("cu") <= k, F.col("cu"))), F.lit(0)).alias(
            "c_u"
        ),
        # COALESCE: SUM over the empty hash table is NULL where the old
        # COUNT(DISTINCT)/COUNT(*) spelling (and the oracle) says 0 —
        # caught by the all-empty sweep, r19
        F.coalesce(F.sum("nk_a"), F.lit(0).cast("bigint")).alias("exact_a"),
        F.coalesce(F.sum("nk_b"), F.lit(0).cast("bigint")).alias("exact_b"),
        F.coalesce(
            F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0)),
            F.lit(0).cast("bigint"),
        ).alias("exact_inter"),
    )

    def est(tag: str):
        # try_divide, not `/` (ADVICE r13 → r14): md5 is unkeyed, so tau=0
        # is not probabilistic noise — an adversary can brute-force (~2^48
        # trials per key) custkeys whose md5 starts with 12 zero hex chars,
        # and a side containing only such keys makes tau = 0.  Plain ANSI
        # `/` would abort the whole Spark job on that crafted input while
        # the DuckDB oracle returns NULL (verified: double/0.0 → NULL in
        # DuckDB); try_divide converges both engines on NULL.  Empty sides
        # (tau NULL) were already NULL-safe either way.
        return F.try_divide(
            (F.col(f"c_{tag}").cast("double") - 1.0) * float(_KMV_DOMAIN),
            F.col(f"tau_{tag}").cast("double"),
        )

    return agg.select(
        F.lit(_KMV_K).cast("bigint").alias("k"),
        est("a").alias("est_a"),
        est("b").alias("est_b"),
        est("u").alias("est_union"),
        (est("a") + est("b") - est("u")).alias("est_inter"),
        "exact_a",
        "exact_b",
        "exact_inter",
    )


# ---------------------------------------------------------------------------
# join_bloomprune — Bloom-prefiltered semi-join (round 7)
# ---------------------------------------------------------------------------

_BLOOMPRUNE_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


@query("join_bloomprune", oracle=_BLOOMPRUNE_ORACLE)
def join_bloomprune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join: the sketch_bloom filter promoted from a
    demonstration to a JOIN OPERATOR. The urgent-order customer key set is
    folded into the 8192-bit / 4-hash md5 Bloom filter (256 bit_or words);
    every customer probes the broadcast word table first, and only
    maybe-members reach the exact semi-join that removes the false
    positives. The oracle is the PLAIN semi-join — the Bloom stage is a
    physical optimization that must not move a single row, and the
    hash-check proves it doesn't (no-false-negatives is load-bearing, not
    just asserted).

    Why this matters at 100 TB: a semi-join against a key set too big to
    broadcast otherwise shuffles the ENTIRE probe side. The ~1 KB filter
    always broadcasts; definite non-members (the overwhelming majority in
    selective semi-joins) die in the scan stage without ever entering the
    exchange, so the shuffle carries true members + the ~2 % false-positive
    leakage instead of everything — the same plan Spark's runtime row-group
    bloom pushdown builds, here explicit and engine-checkable. On the
    fixture the key set is also broadcastable, so the final join is a
    broadcast left-semi; at scale it becomes a shuffle join over the
    pruned survivors with the identical shape."""
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .localCheckpoint()  # consumed twice: filter build + exact join
    )
    bits = None
    for i in range(_BLOOM_HASHES):
        part = urgent.select(_bloom_pos_spark(F.col("o_custkey"), i).alias("pos"))
        bits = part if bits is None else bits.unionAll(part)
    bloom = (
        bits.withColumn("word", (F.col("pos") / 32).cast("bigint"))
        .withColumn("bit", (F.col("pos") % 32).cast("int"))
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("w"))
        # pin the (<=256-row) word table: each of the 4 probe joins
        # broadcasts it, and without the checkpoint every broadcast
        # re-runs the build aggregate over the key set (4x the build cost
        # for identical bits — the x_dedup_near persisted-input pattern)
        .localCheckpoint()
    )
    probes = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        *[
            _bloom_pos_spark(F.col("c_custkey"), i).alias(f"p{i}")
            for i in range(_BLOOM_HASHES)
        ],
    )
    maybe = F.lit(True)
    for i in range(_BLOOM_HASHES):
        b = bloom.select(F.col("word").alias(f"word{i}"), F.col("w").alias(f"w{i}"))
        probes = probes.join(
            F.broadcast(b),
            (F.col(f"p{i}") / 32).cast("bigint") == F.col(f"word{i}"),
            "left",
        )
        bit_set = F.expr(f"(shiftright(w{i}, CAST(p{i} % 32 AS INT)) & 1) = 1")
        maybe = maybe & F.coalesce(bit_set, F.lit(False))
    survivors = probes.filter(maybe).select("c_custkey", "c_mktsegment", "c_acctbal")
    exact = survivors.join(
        F.broadcast(urgent),
        survivors.c_custkey == urgent.o_custkey,
        "left_semi",
    )
    return exact.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_acctbal"),
    )
