"""Direct tests for operators/exact.py — the order-independent exact
aggregates backing the r12 deterministic-emission hardening. The queries
prove them end-to-end against DuckDB; these prove the CONTRACT:
bit-equality with decimal-exact arithmetic regardless of row order or
partitioning, and bit-equality with the documented DuckDB twin formula."""

from __future__ import annotations

import random
from decimal import Decimal

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from reddit_big_data_spark.operators.exact import exact_avg, exact_sum, unit_col

from pyspark.sql import functions as F


def _spark_sum(spark, values, scale, partitions):
    df = spark.createDataFrame(
        [(float(v),) for v in values], "v double"
    ).repartition(partitions)
    return df.agg(exact_sum(F.col("v"), scale).alias("s")).first()["s"]


def _spark_avg(spark, values, scale, partitions):
    df = spark.createDataFrame(
        [(float(v),) for v in values], "v double"
    ).repartition(partitions)
    return df.agg(exact_avg(F.col("v"), scale).alias("a")).first()["a"]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000_00),  # cents
        min_size=1,
        max_size=60,
    ),
    st.randoms(use_true_random=False),
)
def test_exact_sum_is_order_and_partition_independent(spark, cents, rng):
    """exact_sum over 2dp values equals the Decimal-exact sum divided at
    the end — for ANY row order and partitioning (float SUM has neither
    property; that reassociation freedom is exactly what the emission
    hardening removes)."""
    values = [c / 100.0 for c in cents]
    want = float(Decimal(sum(cents)) / 100)
    shuffled = values[:]
    rng.shuffle(shuffled)
    for parts in (1, 7):
        got = _spark_sum(spark, shuffled, 2, parts)
        assert got == want, (got, want, shuffled)


def test_exact_sum_matches_duckdb_twin_formula(spark):
    """The docstring's DuckDB twin must produce the bit-identical double
    (this equality is what the driver's hash compare relies on)."""
    rng = random.Random(7)
    values = [round(rng.uniform(0, 99999), 2) for _ in range(500)]
    for scale in (2, 4):
        got = _spark_sum(spark, values, scale, 5)
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"v": values}))
        want = con.execute(
            f"SELECT SUM(CAST(FLOOR(v * {10**scale} + 0.5) AS BIGINT))"
            f" / {10**scale}.0 FROM t"
        ).fetchone()[0]
        assert got == want, (scale, got, want)


def test_exact_avg_matches_duckdb_twin_formula(spark):
    rng = random.Random(11)
    values = [round(rng.uniform(0, 999), 2) for _ in range(64)]  # 2,5-smooth n
    got = _spark_avg(spark, values, 2, 3)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": values}))
    want = con.execute(
        "SELECT SUM(CAST(FLOOR(v * 100 + 0.5) AS BIGINT)) / 100.0 / COUNT(v)"
        " FROM t"
    ).fetchone()[0]
    assert got == want, (got, want)


def test_unit_col_absorbs_float_noise(spark):
    """Values within half a unit of the true fixed-point grid land on
    the SAME integer — the property that makes per-row conversion robust
    to the upstream product's ulp noise."""
    rows = [
        (307.03 + 1e-9, 30703),
        (307.03 - 1e-9, 30703),
        (0.005, 0),          # exactly representable? 0.005 is not; floor
        (99.34, 9934),
        (0.03, 3),
    ]
    df = spark.createDataFrame([(v,) for v, _ in rows], "v double")
    got = [
        r["u"]
        for r in df.select(unit_col(F.col("v"), 2).alias("u")).collect()
    ]
    # 0.005*100 + 0.5 = 1.0 - ulp or 1.0 + ulp depending on repr; pin the
    # actual IEEE result so both engines agree by construction
    import math

    want = [u if i != 2 else int(math.floor(0.005 * 100 + 0.5))
            for i, (_, u) in enumerate(rows)]
    assert got == want, (got, want)


def test_exact_sum_handles_negatives(spark):
    """Signed deltas (q72's net_delta shape): FLOOR(x + 0.5) is
    round-half-up for negatives too, and both engines agree because the
    formula is pure IEEE arithmetic."""
    values = [-3.14, 2.72, -0.005, 10.0]
    got = _spark_sum(spark, values, 2, 2)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": values}))
    want = con.execute(
        "SELECT SUM(CAST(FLOOR(v * 100 + 0.5) AS BIGINT)) / 100.0 FROM t"
    ).fetchone()[0]
    assert got == want, (got, want)
