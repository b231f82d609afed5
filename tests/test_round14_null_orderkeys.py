"""Round-14 ASC-null-order audit pins.

The r14 events fuzz surfaced a DIVERGENCE CLASS, not just two bugs: Spark
orders NULLs FIRST under bare ASC while DuckDB orders them LAST under
both directions (probed r14), so any value-affecting ordering (row_number
/ rank / ntile / lag / first-last / LIMIT-after-sort) over a nullable ASC
key silently diverges the moment a NULL key appears. The audit swept
every orderBy site in the engine:

- DESC-ordered keys agree by accident (both engines nulls-last) — the
  win_rownum/win_rank/topk_pergroup/x_sim_* family is safe as written.
- ASC keys are almost all non-nullable by construction (ids, positions,
  timestamps, exploded tokens, md5 hex, counts) — adjudicated per site.
- Two real latent sites, both fixed + pinned here: win_ntile (the ONE
  §2e window ordering ASC on a nullable column — o_totalprice; now
  asc_nulls_last / NULLS LAST on both engines) and sketch_kmv (a NULL
  custkey hashes to a NULL h that sorts FIRST into Spark's k-smallest
  top-k but LAST in DuckDB's, displacing one real hash from the sketch;
  NULL keys are now excluded from the key-set universe on both sides —
  a KMV sketch is defined over keys, and NULL is not a key, exactly as
  the exact COUNT(DISTINCT) calibration columns already treat it).

The r12 window fuzz pool also gained NULL prices, so the whole §2e
family stays swept under NULL order keys from now on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .test_round10_properties import _oracle_parity, _write_orders

# one NULL-priced order per status partition, plus ties around it, so the
# quartile/pct_rank/cume assignment visibly depends on where NULL sorts
_NTILE_ORDERS = [
    # (key, cust, status, price, day, prio)
    (1, 1, "O", 100.00, 0, "1-URGENT"),
    (2, 2, "O", 100.00, 1, "3-MEDIUM"),
    (3, 3, "O", None, 2, "3-MEDIUM"),
    (4, 4, "O", 250.50, 3, "1-URGENT"),
    (5, 5, "O", 999.99, 4, "5-LOW"),
    (6, 6, "F", None, 5, "3-MEDIUM"),
    (7, 7, "F", 100.00, 6, "1-URGENT"),
    (8, 8, "P", None, 7, "5-LOW"),
]


def test_win_ntile_null_price_lands_identically(spark, tmp_path):
    d = str(tmp_path)
    _write_orders(spark, d, _NTILE_ORDERS)
    _oracle_parity(spark, d, ("win_ntile",))


def test_desc_windows_agree_under_null_keys(spark, tmp_path):
    """The DESC side of the audit, pinned: Spark's desc() and DuckDB's
    DESC both default nulls-LAST, so the row_number/rank/top-k family
    needs no pin — but that agreement is an accident of defaults worth
    a deterministic regression (a future engine default change or a
    rewrite to ASC would surface here, not in production). Covers NULL
    order keys (price/acctbal) and a NULL partition key (segment)."""
    d = str(tmp_path)
    _write_orders(spark, d, _NTILE_ORDERS)
    spark.createDataFrame(
        [
            (0, "Customer#0", 1, 100.0, "BUILDING"),
            (1, "Customer#1", 2, None, "BUILDING"),
            (2, "Customer#2", 3, 100.0, "BUILDING"),
            (3, "Customer#3", 1, None, None),
            (4, "Customer#4", 2, 300.0, None),
            (5, "Customer#5", 3, None, "MACHINERY"),
        ],
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/customer.parquet")
    _oracle_parity(
        spark,
        d,
        ("win_rownum", "win_rank", "topk_pergroup", "sort_multi",
         "limit_topk"),
    )


def test_kmv_ignores_null_keys_even_past_k(spark, tmp_path):
    """>k distinct keys per side PLUS NULL-key rows: without the source
    filter, Spark's ASC top-k admits the NULL hash first (displacing the
    k-th real hash, shifting tau) while DuckDB's never does. With it, the
    sketch and every exact calibration column measure the same non-NULL
    key universe on both engines."""
    rows = [(i, i % 97, "O" if i % 2 == 0 else "F", 10.0, i % 30, "5-LOW")
            for i in range(200)]
    rows += [(500, None, "O", 10.0, 1, "5-LOW"),
             (501, None, "F", 10.0, 2, "5-LOW")]
    d = str(tmp_path)
    _write_orders(spark, d, rows)
    _oracle_parity(spark, d, ("sketch_kmv",))

    from reconciliation_hive_data_spark import registry

    registry.load_all_modules()
    row = registry.get("sketch_kmv").fn(spark, d).collect()[0]
    # both sides have 97-key universes > k=64: the sketch must be FULL of
    # real hashes (c = k exactly), which the NULL displacement would break
    # only via tau — assert the estimates landed in a sane band instead of
    # degenerating (NULL tau / displaced tau inflate or null the estimate)
    assert row["exact_a"] == row["exact_b"] == 97
    assert row["est_a"] is not None and 40 < row["est_a"] < 200
    assert row["est_b"] is not None and 40 < row["est_b"] < 200
