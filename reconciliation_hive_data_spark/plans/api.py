"""Generic reconciliation API — the engine's user-facing surface.

The reference's central object is the reconciliation pair config: (source
table, target table, key columns, compare columns) from which it generates
every per-check query (SURVEY.md §1.1, genre-defining). This module is that
config object for the Spark engine: a :class:`ReconPair` describes WHAT to
reconcile; each method composes the corresponding distributed check from
operators in :mod:`plans.recon`'s style and returns a report DataFrame.

The named queries in plans/recon.py are fixed instantiations kept for the
oracle harness; users reconcile their own tables through this API::

    pair = ReconPair(
        source=spark.read.parquet("s3://prod/orders"),
        target=spark.read.parquet("s3://replica/orders"),
        keys=["o_orderkey"],
        compare_cols={"o_totalprice": "double", "o_orderstatus": "string"},
        tolerance=0.01,
    )
    pair.summary()        # one-row MATCH/DIFF rollup of every check
    pair.row_counts("o_orderstatus")
    pair.key_diff()       # keys missing per side
    pair.duplicate_keys()
    pair.row_hash_diff()  # md5 canonical row fingerprint mismatches
    pair.cell_diff()      # (key, column, src_val, tgt_val) mismatch rows
    pair.fingerprints()   # per-column algebraic fingerprints both sides
    pair.drift("o_totalprice", width=50000.0)  # PSI distribution drift
    pair.sample_audit("0")  # row-hash audit on a deterministic 1/16 sample

Every report is algebraic/partially-aggregatable or a key-shuffled
anti/inner join — the shapes that hold at 100 TB (SURVEY.md §7.3.7).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..canonical import (
    canonical_row_hash,
    canonical_row_hash_sql,
    dround,
    money_sum,
)
from ..catalog import load
from ..registry import query

#: compare-column kinds accepted by canonical serialization
_KINDS = ("int", "double", "string", "ts")


@dataclass
class ReconPair:
    source: DataFrame
    target: DataFrame
    keys: list[str]
    #: column → canonical kind ('int' | 'double' | 'string' | 'ts')
    compare_cols: dict[str, str]
    #: numeric tolerance for double comparisons (cell_diff / summary)
    tolerance: float = 0.0

    def __post_init__(self) -> None:
        for col, kind in self.compare_cols.items():
            if kind not in _KINDS:
                raise ValueError(f"{col}: unknown kind {kind!r}; use one of {_KINDS}")
        wanted = [*self.keys, *self.compare_cols]
        missing = [c for c in wanted if c not in self.source.columns]
        if missing:
            raise ValueError(f"columns not in source: {missing}")
        missing_t = [c for c in wanted if c not in self.target.columns]
        if missing_t:
            raise ValueError(f"columns not in target: {missing_t}")

    # -- helpers ----------------------------------------------------------

    def _key(self) -> list[str]:
        return list(self.keys)

    def _hash_cols(self) -> list[tuple[str, str]]:
        return [(k, "int") for k in self.keys] + list(self.compare_cols.items())

    # -- checks -----------------------------------------------------------

    def row_counts(self, grain: str | None = None) -> DataFrame:
        """Per-grain (or global) row counts with diff + flag."""
        gcols = [grain] if grain else []

        def side(df: DataFrame, name: str) -> DataFrame:
            g = df.groupBy(*gcols) if gcols else df.groupBy()
            return g.agg(F.count("*").alias(name))

        s, t = side(self.source, "src_cnt"), side(self.target, "tgt_cnt")
        j = s.join(t, gcols, "full_outer") if gcols else s.crossJoin(t)
        src, tgt = F.coalesce("src_cnt", F.lit(0)), F.coalesce("tgt_cnt", F.lit(0))
        return j.select(
            *gcols,
            src.alias("src_cnt"),
            tgt.alias("tgt_cnt"),
            (src - tgt).alias("diff"),
            F.when(src == tgt, "MATCH").otherwise("COUNT_DIFF").alias("status"),
        )

    def key_diff(self) -> DataFrame:
        """Keys present on exactly one side (sort-merge anti joins)."""
        sk = self.source.select(*self._key()).distinct()
        tk = self.target.select(*self._key()).distinct()
        miss_t = sk.join(tk, self._key(), "left_anti").select(
            *self._key(), F.lit("MISSING_IN_TARGET").alias("side")
        )
        miss_s = tk.join(sk, self._key(), "left_anti").select(
            *self._key(), F.lit("MISSING_IN_SOURCE").alias("side")
        )
        return miss_t.unionByName(miss_s)

    def duplicate_keys(self) -> DataFrame:
        """Keys occurring more than once, per side."""

        def dups(df: DataFrame, side: str) -> DataFrame:
            return (
                df.groupBy(*self._key())
                .agg(F.count("*").alias("cnt"))
                .filter(F.col("cnt") > 1)
                .select(F.lit(side).alias("side"), *self._key(), "cnt")
            )

        return dups(self.source, "source").unionByName(dups(self.target, "target"))

    def row_hash_diff(self) -> DataFrame:
        """Key-matched rows whose canonical md5 fingerprints differ."""
        cols = self._hash_cols()
        sh = self.source.select(*self._key(), canonical_row_hash(cols).alias("h"))
        th = self.target.select(*self._key(), canonical_row_hash(cols).alias("h")).distinct()
        j = sh.alias("s").join(th.alias("t"), self._key())
        return j.filter(F.col("s.h") != F.col("t.h")).select(
            *self._key(),
            F.col("s.h").alias("src_hash"),
            F.col("t.h").alias("tgt_hash"),
        )

    def cell_diff(self) -> DataFrame:
        """One row per (key, differing column): src vs tgt canonical values.
        Doubles respect ``tolerance``; every comparison (tolerance or not)
        is null-safe — a null on exactly one side always reports a diff.

        Duplicate target keys are deduped DETERMINISTICALLY: the survivor is
        the row with the smallest canonical row hash (total order within a
        key group), not whatever partition ``dropDuplicates`` happens to see
        first — so the reported src/tgt values are stable run-to-run and
        reproducible in the SQL oracle."""
        from pyspark.sql.window import Window

        key = self._key()
        s = self.source.alias("s")
        w = Window.partitionBy(*key).orderBy(canonical_row_hash(self._hash_cols()))
        t = (
            self.target.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .alias("t")
        )
        j = s.join(t, [F.col(f"s.{k}") == F.col(f"t.{k}") for k in key])

        arms: list[Column] = []
        for col, kind in self.compare_cols.items():
            sc, tc = F.col(f"s.{col}"), F.col(f"t.{col}")
            if kind == "double" and self.tolerance > 0:
                # Null-safe even with tolerance: |s - t| is NULL when either
                # side is null, and TRUE|NULL / ~(FALSE|NULL) semantics would
                # silently drop null-vs-value diffs. Split the null-mismatch
                # arm out so it can never be eaten by a NULL comparison.
                differs = (sc.isNull() != tc.isNull()) | (
                    ~sc.eqNullSafe(tc) & (F.abs(sc - tc) > F.lit(self.tolerance))
                )
            else:
                differs = ~sc.eqNullSafe(tc)
            arms.append(
                F.when(
                    differs,
                    F.struct(
                        F.lit(col).alias("col_name"),
                        sc.cast("string").alias("src_val"),
                        tc.cast("string").alias("tgt_val"),
                    ),
                )
            )
        exploded = j.select(
            *[F.col(f"s.{k}").alias(k) for k in key],
            F.explode(F.filter(F.array(*arms), lambda x: x.isNotNull())).alias("d"),
        )
        return exploded.select(
            *key,
            F.col("d.col_name").alias("col_name"),
            F.col("d.src_val").alias("src_val"),
            F.col("d.tgt_val").alias("tgt_val"),
        )

    def fingerprints(self) -> DataFrame:
        """Per-column algebraic fingerprints for both sides, unpivoted to
        (metric, src_val, tgt_val, diff, status) rows."""

        def side_agg(df: DataFrame) -> DataFrame:
            aggs = [F.count("*").cast("double").alias("row_count")]
            for col, kind in self.compare_cols.items():
                aggs.append(
                    F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
                    .cast("double")
                    .alias(f"nulls__{col}")
                )
                aggs.append(
                    F.countDistinct(col).cast("double").alias(f"distinct__{col}")
                )
                if kind in ("int", "double"):
                    aggs.append(money_sum(col, f"sum__{col}"))
                    aggs.append(F.min(col).cast("double").alias(f"min__{col}"))
                    aggs.append(F.max(col).cast("double").alias(f"max__{col}"))
            return df.agg(*aggs)

        s, t = side_agg(self.source), side_agg(self.target)
        metrics = s.columns
        stack = ", ".join(f"'{m}', `{m}`" for m in metrics)

        def unpivot(df: DataFrame, val: str) -> DataFrame:
            return df.selectExpr(f"stack({len(metrics)}, {stack}) as (metric, {val})")

        j = unpivot(s, "sval").join(unpivot(t, "tval"), "metric")
        # Null-safe status (r15, §7.7.2): a metric that is NULL on BOTH
        # sides (min/max/sum over an empty or all-null side) is equally
        # absent — MATCH, not the FP_DIFF the bare NULL comparison's
        # when/otherwise fell into; NULL on exactly one side stays a diff.
        return j.select(
            "metric",
            dround("sval", 4).alias("src_val"),
            dround("tval", 4).alias("tgt_val"),
            dround(F.col("sval") - F.col("tval"), 4).alias("diff"),
            F.when(
                F.col("sval").eqNullSafe(F.col("tval"))
                | (F.abs(F.col("sval") - F.col("tval")) < 1e-9),
                "MATCH",
            )
            .otherwise("FP_DIFF")
            .alias("status"),
        )

    def drift(self, value_col: str, width: float, top_bucket: int = 9) -> DataFrame:
        """Distribution drift source↔target as per-bucket PSI contributions
        (Σpsi > 0.2 = shifted, by the usual monitoring convention). The
        cheap no-key-join tier: two aggregate scans however many rows
        changed. Delegates to :func:`plans.recon_scale.psi_frame`, whose
        sensitivity is pinned by a synthetic known-drift test."""
        from .recon_scale import psi_frame

        if value_col not in self.compare_cols:
            raise ValueError(f"{value_col}: not a compare column")
        return psi_frame(self.source, self.target, value_col, width, top_bucket)

    def sample_audit(self, prefix: str = "0") -> DataFrame:
        """Full-fidelity canonical-row-hash audit on a deterministic key
        sample: keys whose md5 hex starts with ``prefix`` (1 char = 1/16 of
        keys, 2 chars = 1/256, ...). No RNG state — the same keys sample on
        every run and cluster size, so consecutive audits are comparable.
        The predicate filters both sides BEFORE the join shuffle, so cost
        tracks the sample fraction (the hourly-tier knob; the nightly full
        run is :meth:`row_hash_diff`)."""
        key = self.keys[0]
        pred = F.substring(
            F.md5(F.col(key).cast("string")), 1, len(prefix)
        ) == prefix
        cols = self._hash_cols()
        src = self.source.filter(pred).select(
            *self._key(), canonical_row_hash(cols).alias("h")
        )
        tgt = self.target.filter(pred).select(
            *self._key(), canonical_row_hash(cols).alias("h")
        )
        s, t = src.alias("s"), tgt.alias("t")
        sk, tk = F.col(f"s.{key}"), F.col(f"t.{key}")
        status = (
            F.when(tk.isNull(), "MISSING_IN_TARGET")
            .when(sk.isNull(), "MISSING_IN_SOURCE")
            .when(F.col("s.h") == F.col("t.h"), "MATCH")
            .otherwise("MISMATCH")
        )
        return (
            s.join(t, sk == tk, "full_outer")
            .groupBy(status.alias("status"))
            .agg(F.count("*").alias("n_keys"))
        )

    def summary(self) -> DataFrame:
        """One row per check with its violation count — the report header a
        reconciliation run prints first.

        Fused computation (r19, guide §2.4): the six checks' COUNTS are
        derived from two shared passes instead of six independent check
        plans (which consumed source and target twelve times behind
        different shuffle keys — r18's shape, kept only via persist):

        - **per-key tier** (keys_missing, duplicate_keys, row_hash_diffs,
          cell_diffs): the target is aggregated once per key — row count,
          DISTINCT canonical-hash set, and the deterministic min-hash
          survivor row (``min_by`` over the canonical row hash ==
          cell_diff's row_number-over-hash dedup; tied rows hash-tie only
          when their canonical serializations are identical, so the pick
          is value-invisible) — then ONE full-outer join against the
          per-row hashed source yields every per-row and per-key count:
          a source row's hash mismatches = |t hash set| − [h ∈ set]; its
          cell diffs = per-column null-safe/tolerance compares against the
          survivor struct; key-level presence/duplicate flags re-aggregate
          by key (no extra exchange — already key-partitioned). NULL keys
          keep the joins' never-match semantics via a null-side grouping
          column (each side's NULL-key group stays its own row, exactly as
          the distinct+anti-join and per-side groupBys treated them).
        - **global tier** (count_diff_grains, fingerprint_diffs): one
          aggregate pass per side (the fingerprints() metric vector, whose
          row_count metric already carries the count check — integer
          counts differ by ≥ 1, so the 1e-9 fingerprint tolerance and the
          exact count comparison agree with the separate spellings).

        Each check's count is EXACTLY the row count of the corresponding
        standalone method's frame (pinned against the unfused spelling in
        tests/test_round19_opt.py and by the fault-census fuzz in
        tests/test_api_fuzz.py); the methods themselves are unchanged.

        The r18 persist-both-sides lifecycle is GONE with the fan-out that
        justified it: each side now has exactly two consumers, and the
        measured cache-population cost exceeded the second scan's price
        (2.8-2.9 s vs 2.2-2.5 s per report at sf0.1, r19 A/B). At 100 TB
        the same call holds — two column-pruned passes (the per-key tier
        reads keys+compare+hash columns, the global tier compare columns
        only) beat staging the full wide table once. The 6-row report is
        still materialized eagerly (localCheckpoint) so the driver's
        count/collect never re-runs the checks."""
        from operator import add, or_

        key = self._key()
        cols = list(self.compare_cols)
        h = canonical_row_hash(self._hash_cols())

        # --- per-key tier: checks 2-5 from one exchange pair + join ----
        s_rows = self.source.select(
            *key, *cols, h.alias("_h"), F.lit(1).alias("_sp")
        )
        t_agg = (
            self.target.select(*key, *cols, h.alias("_h"))
            .groupBy(*key)
            .agg(
                F.count("*").alias("_tc"),
                F.collect_set("_h").alias("_th"),
                F.min_by(F.struct(*cols), F.col("_h")).alias("_tr"),
            )
        )
        j = s_rows.join(t_agg, key, "full_outer")
        s_present = F.col("_sp").isNotNull()
        t_present = F.col("_tc").isNotNull()
        rh = F.when(
            s_present & t_present,
            F.size("_th") - F.array_contains("_th", F.col("_h")).cast("int"),
        ).otherwise(F.lit(0))
        cell_arms = []
        for col, kind in self.compare_cols.items():
            sc, tc = F.col(col), F.col("_tr").getField(col)
            if kind == "double" and self.tolerance > 0:
                differs = (sc.isNull() != tc.isNull()) | (
                    ~sc.eqNullSafe(tc) & (F.abs(sc - tc) > F.lit(self.tolerance))
                )
            else:
                differs = ~sc.eqNullSafe(tc)
            cell_arms.append(F.when(differs, 1).otherwise(0))
        cells = F.when(
            s_present & t_present,
            reduce(add, cell_arms) if cell_arms else F.lit(0),
        ).otherwise(F.lit(0))
        # NULL keys never equi-join: each side's NULL-key group must stay
        # its own row (the _bh_digest_both _nullside pattern)
        nullside = F.when(
            reduce(or_, [F.col(k).isNull() for k in key]),
            F.coalesce(F.col("_sp"), F.lit(0)),
        )
        key_agg = j.groupBy(*key, nullside.alias("_ns")).agg(
            F.sum(F.coalesce(F.col("_sp"), F.lit(0))).alias("_scnt"),
            F.max("_tc").alias("_tcnt"),
            F.sum(rh).alias("_rh"),
            F.sum(cells).alias("_cells"),
        )
        zero = F.lit(0).cast("bigint")
        one = F.lit(1).cast("bigint")
        key_roll = key_agg.agg(
            F.coalesce(
                F.sum(
                    F.when((F.col("_scnt") > 0) & F.col("_tcnt").isNull(), one)
                    .otherwise(zero)
                    + F.when((F.col("_scnt") == 0) & F.col("_tcnt").isNotNull(), one)
                    .otherwise(zero)
                ),
                zero,
            ).alias("keys_missing"),
            F.coalesce(
                F.sum(
                    F.when(F.col("_scnt") > 1, one).otherwise(zero)
                    + F.when(F.col("_tcnt") > 1, one).otherwise(zero)
                ),
                zero,
            ).alias("duplicate_keys"),
            F.coalesce(F.sum("_rh"), zero).cast("bigint").alias("row_hash_diffs"),
            F.coalesce(F.sum("_cells"), zero).cast("bigint").alias("cell_diffs"),
        )

        # --- global tier: the fingerprint metric vector carries both ----
        def side_agg(df: DataFrame) -> DataFrame:
            aggs = [F.count("*").cast("double").alias("row_count")]
            for col, kind in self.compare_cols.items():
                aggs.append(
                    F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
                    .cast("double")
                    .alias(f"nulls__{col}")
                )
                aggs.append(
                    F.countDistinct(col).cast("double").alias(f"distinct__{col}")
                )
                if kind in ("int", "double"):
                    aggs.append(money_sum(col, f"sum__{col}"))
                    aggs.append(F.min(col).cast("double").alias(f"min__{col}"))
                    aggs.append(F.max(col).cast("double").alias(f"max__{col}"))
            return df.agg(*aggs)

        sfp = side_agg(self.source)
        metrics = sfp.columns
        stack = ", ".join(f"'{m}', `{m}`" for m in metrics)

        def unpivot(df: DataFrame, val: str) -> DataFrame:
            return df.selectExpr(f"stack({len(metrics)}, {stack}) as (metric, {val})")

        jfp = unpivot(sfp, "sval").join(
            unpivot(side_agg(self.target), "tval"), "metric"
        )
        fp_match = F.col("sval").eqNullSafe(F.col("tval")) | (
            F.abs(F.col("sval") - F.col("tval")) < 1e-9
        )
        fp_roll = jfp.agg(
            F.sum(
                F.when(
                    (F.col("metric") == "row_count")
                    & (F.col("sval") != F.col("tval")),
                    one,
                ).otherwise(zero)
            ).alias("count_diff_grains"),
            F.sum(F.when(fp_match, zero).otherwise(one)).alias(
                "fingerprint_diffs"
            ),
        )

        report = (
            key_roll.crossJoin(fp_roll)
            .selectExpr(
                "stack(6, "
                "'count_diff_grains', count_diff_grains, "
                "'keys_missing', keys_missing, "
                "'duplicate_keys', duplicate_keys, "
                "'row_hash_diffs', row_hash_diffs, "
                "'cell_diffs', cell_diffs, "
                "'fingerprint_diffs', fingerprint_diffs"
                ") as (check, violations)"
            )
            .withColumn(
                "status",
                F.when(F.col("violations") == 0, "MATCH").otherwise("DIFF"),
            )
            .localCheckpoint()
        )
        return report


def _summary_oracle() -> str:
    """SQL twin of ReconPair.summary() on the standard faulty pair: every
    check transliterated honestly (no key-arithmetic shortcuts), so the
    composite API itself is hash-checked end-to-end."""
    from .recon import ORDERS_TGT_CTE, _ORDER_HASH_COLS

    hash_sql = canonical_row_hash_sql(_ORDER_HASH_COLS)
    fp_metrics = """
      SELECT CAST(COUNT(*) AS DOUBLE) AS row_count,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS m1,
             CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS m2,
             CAST(SUM(CAST(o_custkey AS DECIMAL(18,6))) AS DOUBLE) AS m3,
             CAST(MIN(o_custkey) AS DOUBLE) AS m4,
             CAST(MAX(o_custkey) AS DOUBLE) AS m5,
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS m6,
             CAST(COUNT(DISTINCT o_orderstatus) AS DOUBLE) AS m7,
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS m8,
             CAST(COUNT(DISTINCT o_totalprice) AS DOUBLE) AS m9,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS m10,
             CAST(MIN(o_totalprice) AS DOUBLE) AS m11,
             CAST(MAX(o_totalprice) AS DOUBLE) AS m12,
             CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS m13,
             CAST(COUNT(DISTINCT o_orderdate) AS DOUBLE) AS m14,
             CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS m15,
             CAST(COUNT(DISTINCT o_orderpriority) AS DOUBLE) AS m16
      FROM {side}
    """
    # Null-safe terms (r15, §7.7.2): one-side-NULL is a diff (the bare
    # ABS() comparison NULL-propagated to 0 there), both-NULL is a match —
    # mirroring the plan's eqNullSafe status exactly.
    diff_terms = " + ".join(
        f"(CASE WHEN (s.{m} IS NULL) <> (t.{m} IS NULL) THEN 1"
        f" WHEN ABS(s.{m} - t.{m}) >= 1e-9 THEN 1 ELSE 0 END)"
        for m in ["row_count"] + [f"m{i}" for i in range(1, 17)]
    )
    return (
        ORDERS_TGT_CTE
        + f"""
, tgt_dedup AS (
  -- deterministic survivor: smallest canonical row hash, mirroring
  -- ReconPair.cell_diff's row_number-over-hash dedup exactly
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY {hash_sql}) rn
    FROM orders_tgt
  ) WHERE rn = 1
),
counts AS (
  SELECT CASE WHEN (SELECT COUNT(*) FROM orders) = (SELECT COUNT(*) FROM orders_tgt)
              THEN 0 ELSE 1 END AS v
),
missing AS (
  SELECT (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderkey FROM orders
                                EXCEPT SELECT DISTINCT o_orderkey FROM orders_tgt))
       + (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderkey FROM orders_tgt
                                EXCEPT SELECT DISTINCT o_orderkey FROM orders)) AS v
),
dups AS (
  SELECT (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                                GROUP BY o_orderkey HAVING COUNT(*) > 1))
       + (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders_tgt
                                GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS v
),
sh AS (SELECT o_orderkey, {hash_sql} AS h FROM orders),
th AS (SELECT DISTINCT o_orderkey, {hash_sql} AS h FROM orders_tgt),
rowhash AS (
  SELECT COUNT(*) AS v FROM sh JOIN th ON sh.o_orderkey = th.o_orderkey
  WHERE sh.h <> th.h
),
cells AS (
  SELECT
    SUM(CASE WHEN s.o_custkey IS DISTINCT FROM t.o_custkey THEN 1 ELSE 0 END)
  + SUM(CASE WHEN s.o_orderstatus IS DISTINCT FROM t.o_orderstatus THEN 1 ELSE 0 END)
  + SUM(CASE WHEN (s.o_totalprice IS NULL) <> (t.o_totalprice IS NULL)
              OR (s.o_totalprice IS DISTINCT FROM t.o_totalprice
                  AND ABS(s.o_totalprice - t.o_totalprice) > 0.5) THEN 1 ELSE 0 END)
  + SUM(CASE WHEN s.o_orderdate IS DISTINCT FROM t.o_orderdate THEN 1 ELSE 0 END)
  + SUM(CASE WHEN s.o_orderpriority IS DISTINCT FROM t.o_orderpriority THEN 1 ELSE 0 END)
    AS v
  FROM orders s JOIN tgt_dedup t ON s.o_orderkey = t.o_orderkey
),
-- COALESCE (r15, §7.7.2): the SUM over a zero-row join is NULL, which the
-- status CASE read as 'DIFF' — empty == empty must report MATCH, as the
-- plan's count(*) = 0 correctly does
cells0 AS (SELECT COALESCE(v, 0) AS v FROM cells),
sfp AS ({fp_metrics.format(side='orders')}),
tfp AS ({fp_metrics.format(side='orders_tgt')}),
fp AS (SELECT {diff_terms} AS v FROM sfp s CROSS JOIN tfp t)
SELECT "check", CAST(violations AS BIGINT) AS violations,
       CASE WHEN violations = 0 THEN 'MATCH' ELSE 'DIFF' END AS status
FROM (
  SELECT 'count_diff_grains' AS "check", v AS violations FROM counts
  UNION ALL SELECT 'keys_missing', v FROM missing
  UNION ALL SELECT 'duplicate_keys', v FROM dups
  UNION ALL SELECT 'row_hash_diffs', v FROM rowhash
  UNION ALL SELECT 'cell_diffs', v FROM cells0
  UNION ALL SELECT 'fingerprint_diffs', v FROM fp
)
"""
    )


@query("recon_api_summary", oracle=_summary_oracle())
def recon_api_summary(spark, sf_dir: str) -> DataFrame:
    """The generic ReconPair API run end-to-end on the standard faulty pair:
    the one-call reconciliation report a user of the reference gets. The
    oracle transliterates all six checks, so even the composite is
    hash-verified; exact per-fault-class counts are additionally asserted by
    tests/test_recon_api.py."""
    from .recon import orders_target

    orders = load(spark, sf_dir, "orders")
    pair = ReconPair(
        source=orders,
        target=orders_target(orders, faulty=True),
        keys=["o_orderkey"],
        compare_cols={
            "o_custkey": "int",
            "o_orderstatus": "string",
            "o_totalprice": "double",
            "o_orderdate": "ts",
            "o_orderpriority": "string",
        },
        tolerance=0.5,
    )
    return pair.summary()


@query("recon_crossformat", oracle=_summary_oracle())
def recon_crossformat(spark, sf_dir: str) -> DataFrame:
    """Cross-format reconciliation: the standard faulty target is written
    to ORC and read back before reconciling against the parquet source —
    the realistic deployment shape (Hive-era targets rarely share the
    source's format). The report must be IDENTICAL to recon_api_summary's
    (same oracle): a lossless columnar round trip may not create or mask
    a single violation. Any format-conversion drift (timestamp precision,
    float text, NULL encoding) would surface as a changed violation
    count and fail the hash-check.

    The ORC target is an ``artifacts.ensure_artifact`` build — written
    once per fingerprint (join_bucketed's ingest-once pattern, replacing
    a hand-built /tmp path), then every run re-reads it through the full
    six-check reconciliation. The round trip stays proven: any source
    change rebuilds the ORC, and — via ``code=[orders_target]`` — so does
    any edit to the fault-injection transform itself, so the cached
    target can never be a stale-code build. The read-back side is
    exercised on every run."""
    from ..artifacts import ensure_artifact
    from .recon import orders_target

    orders = load(spark, sf_dir, "orders")

    def build(tmp: str) -> None:
        orders_target(orders, faulty=True).write.mode("overwrite").orc(tmp)

    orc_path, _ = ensure_artifact(
        spark, sf_dir, "orders_tgt_orc", ["orders.parquet"], build,
        code=[orders_target],
    )
    pair = ReconPair(
        source=orders,
        target=spark.read.orc(orc_path),
        keys=["o_orderkey"],
        compare_cols={
            "o_custkey": "int",
            "o_orderstatus": "string",
            "o_totalprice": "double",
            "o_orderdate": "ts",
            "o_orderpriority": "string",
        },
        tolerance=0.5,
    )
    return pair.summary()
