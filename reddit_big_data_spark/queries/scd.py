"""q95 — SCD2 dimension-history build, split from queries/maintenance.py
so its registration sits inside the driver's 50-query window without
dragging the (round-3-green) q71-q73 repeats along. See
queries/__init__.py for the rotation policy."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q95 — SCD2 dimension history build (the warehouse MERGE pattern q72's
# diff feeds): snapshots A/B use q72's deterministic construction; the
# operator (operators/diff.py scd2_history) closes changed/removed
# versions at t2, opens new ones, and keeps unchanged rows open from t1.
# One full-outer join + one explode — no second pass. Output rolls the
# history up by (valid_from, valid_to, is_current) with count + checksum.
# --------------------------------------------------------------------------
@register(
    "q95_scd2_history",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_totalprice
      FROM orders WHERE o_orderkey % 3 <> 0
    ),
    b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 100.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 4 <> 0
    ),
    d AS (
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k,
             a.o_orderkey IS NOT NULL AS in_a,
             b.o_orderkey IS NOT NULL AS in_b,
             a.o_totalprice AS old_p, b.o_totalprice AS new_p
      FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    ),
    hist AS (
      SELECT k, old_p AS p, 'v1' AS valid_from,
             CASE WHEN in_b AND old_p = new_p THEN NULL ELSE 'v2' END AS valid_to,
             in_b AND old_p = new_p AS is_current
      FROM d WHERE in_a
      UNION ALL
      SELECT k, new_p AS p, 'v2' AS valid_from, NULL AS valid_to, TRUE AS is_current
      FROM d WHERE in_b AND (NOT in_a OR old_p <> new_p)
    )
    SELECT valid_from, COALESCE(valid_to, 'open') AS valid_to, is_current,
           COUNT(*) AS n, ROUND(SUM(p), 2) AS price_sum
    FROM hist
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    doc="SCD2 history build: close changed/removed versions, open new ones",
)
def q95_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.diff import scd2_history

    orders = read_table(spark, sf_dir, "orders")
    snap_a = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    snap_b = orders.filter(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 100.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    hist = scd2_history(
        snap_a, snap_b, ["o_orderkey"], ["o_totalprice"], "v1", "v2"
    )
    return (
        hist.groupBy(
            "valid_from",
            F.coalesce("valid_to", F.lit("open")).alias("valid_to"),
            "is_current",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
        )
        .orderBy("valid_from", "valid_to", "is_current")
    )
