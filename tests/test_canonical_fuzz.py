"""Adversarial cross-engine fuzz of the determinism kernel (canonical.py):
for money-class inputs — including the dyadic-rational midpoint values that
broke scale-4 casts — Spark and DuckDB must agree bit-for-bit on money_sum,
dround, printf serialization, and the canonical md5 row hash.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from reconciliation_hive_data_spark.canonical import (
    canonical_row_hash,
    canonical_row_hash_sql,
    dround,
    dround_sql,
    money_sum,
    money_sum_sql,
)

# the adversarial set: dyadic rationals on/near decimal midpoints, repr
# boundary cases, and plain money values
ADVERSARIAL = [
    0.125, -0.125, 2.675, 0.015625, 0.1875, 2.000050, 1.0000005,
    0.03125, 99999999.99, -99999999.99, 0.0, 1e-4, -1e-4, 12345.675,
    2.5, -2.5, 0.005, 0.015, 0.025, 1234567.891234,
]


def spark_vs_duck(spark, values: list[float]) -> None:
    pdf = pd.DataFrame({"k": range(len(values)), "x": values})
    sdf = spark.createDataFrame(pdf)
    out = sdf.agg(money_sum("x", "s")).collect()[0]
    row_h = (
        sdf.select(
            canonical_row_hash([("k", "int"), ("x", "double")]).alias("h")
        )
        .orderBy("k")
        .collect()
    )
    dr = sdf.select("k", dround("x", 2).alias("r")).orderBy("k").collect()
    fmt = (
        sdf.select(
            "k",
            (F.col("x") + 0.0).cast("decimal(28,6)").cast("string").alias("f"),
        )
        .orderBy("k")
        .collect()
    )

    con = duckdb.connect()
    con.register("t", pdf)
    d_sum = con.execute(f"SELECT {money_sum_sql('x', 's')} FROM t").fetchone()[0]
    d_hash = con.execute(
        f"SELECT {canonical_row_hash_sql([('k', 'int'), ('x', 'double')])} FROM t ORDER BY k"
    ).fetchall()
    d_round = con.execute(
        f"SELECT {dround_sql('x', 2)} FROM t ORDER BY k"
    ).fetchall()
    d_fmt = con.execute(
        "SELECT CAST(CAST(CAST(x AS DOUBLE) + 0.0 AS DECIMAL(28,6)) AS VARCHAR)"
        " FROM t ORDER BY k"
    ).fetchall()

    assert out.s == d_sum, f"money_sum: {out.s!r} != {d_sum!r}"
    for i, (r, (dr_,)) in enumerate(zip(dr, d_round)):
        assert r.r == dr_, f"dround[{i}] ({values[i]}): {r.r!r} != {dr_!r}"
    for i, (r, (df_,)) in enumerate(zip(fmt, d_fmt)):
        assert r.f == df_, f"canon-str[{i}] ({values[i]}): {r.f!r} != {df_!r}"
    for i, (r, (dh,)) in enumerate(zip(row_h, d_hash)):
        assert r.h == dh, f"row_hash[{i}] ({values[i]})"


def test_adversarial_values(spark):
    spark_vs_duck(spark, ADVERSARIAL)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.decimals(
            min_value=-(10**9), max_value=10**9, places=6, allow_nan=False
        ).map(float),
        min_size=1,
        max_size=30,
    )
)
def test_random_money_class(spark, xs):
    spark_vs_duck(spark, xs)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000_000),
            st.integers(min_value=1, max_value=10_000_000),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=20, deadline=None)
def test_int_ratio_division_is_bit_identical(spark, pairs):
    """Raw double division of int64 pairs must agree bit-for-bit between
    engines — the foundation of the round-6 rule that ratio outputs
    (containment, PMI lift, KMV estimates, HLL raw_estimate) are emitted
    UNROUNDED: IEEE division is exactly rounded, so identical inputs give
    identical bits; engine-native ROUND would diverge exactly where such
    ratios land on decimal midpoints (e.g. 9/16 at 4dp)."""
    pdf = pd.DataFrame(
        {"k": range(len(pairs)),
         "a": [a for a, _ in pairs],
         "b": [b for _, b in pairs]}
    )
    sdf = spark.createDataFrame(pdf)
    mine = {
        r.k: r.q.hex()
        for r in sdf.select(
            "k", (F.col("a").cast("double") / F.col("b").cast("double")).alias("q")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    theirs = {
        k: q.hex()
        for k, q in con.execute(
            "SELECT k, CAST(a AS DOUBLE) / CAST(b AS DOUBLE) FROM t"
        ).fetchall()
    }
    con.close()
    assert mine == theirs
