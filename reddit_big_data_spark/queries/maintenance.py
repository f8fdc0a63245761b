"""Pipeline-maintenance queries: skew-safe joins, snapshot diffing, and
mergeable time-grain rollups — the operational layer a 100 TB
training-data pipeline needs around the analytic queries.

The reference has none of these (single-machine notebooks, data
overwritten in place); they extend SURVEY.md §2 the same way the dedup /
similarity / decontamination families do. Each query routes through the
reusable operator (operators/skew.py, operators/diff.py,
operators/rollup.py) and pins its semantics to a plain-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q71 — salted fact⋈dim join == plain equi-join (skew mitigation, the join
# twin of q64's salted aggregation). events.user_id is the hot-key fact
# side; customer is the small dim. The salt spreads each hot key across 16
# (key, salt) streams while the replicated dim stays broadcast-sized, so
# the oracle IS the unsalted join: this checks the rewrite changes the
# partitioning, never the answer.
# --------------------------------------------------------------------------
@register(
    "q71_salted_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS cnt,
           ROUND(SUM(e.value), 2) AS sum_value,
           COUNT(DISTINCT e.user_id) AS users
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    ORDER BY 1
    """,
    doc="salted broadcast join == plain equi-join (skew-safe fact⋈dim)",
)
def q71_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.skew import salted_join

    ev = read_table(spark, sf_dir, "events").withColumn(
        "c_custkey", F.col("user_id")
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(ev, cust, "c_custkey", n_salt=16)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("users"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# q72 — snapshot diff (dataset versioning). Two deterministic snapshots
# are derived from orders: A drops keys ≡0 (mod 3); B drops keys ≡0
# (mod 4) and shifts the price of keys ≡0 (mod 5) by +100.0 (an exact
# float add — no rounding divergence between engines). The diff operator
# classifies every key in one key-partitioned full-outer join; the oracle
# rebuilds the classification in plain SQL.
# --------------------------------------------------------------------------
@register(
    "q72_snapshot_diff",
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
      SELECT CASE
               WHEN a.o_orderkey IS NULL THEN 'added'
               WHEN b.o_orderkey IS NULL THEN 'removed'
               WHEN a.o_totalprice = b.o_totalprice THEN 'unchanged'
               ELSE 'changed'
             END AS change_type,
             a.o_totalprice AS old_p,
             b.o_totalprice AS new_p
      FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    )
    SELECT change_type,
           COUNT(*) AS cnt,
           ROUND(SUM(COALESCE(new_p, 0) - COALESCE(old_p, 0)), 2) AS net_delta
    FROM d
    GROUP BY 1
    ORDER BY 1
    """,
    doc="full-outer snapshot diff: added/removed/changed/unchanged census",
)
def q72_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.diff import snapshot_diff

    orders = read_table(spark, sf_dir, "orders")
    snap_a = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    snap_b = (
        orders.filter(F.col("o_orderkey") % 4 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 100.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    diff = snapshot_diff(
        snap_a, snap_b, keys=["o_orderkey"], compare_cols=["o_totalprice"]
    )
    return (
        diff.groupBy("change_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(
                F.sum(
                    F.coalesce(F.col("new_o_totalprice"), F.lit(0.0))
                    - F.coalesce(F.col("old_o_totalprice"), F.lit(0.0))
                ),
                2,
            ).alias("net_delta"),
        )
        .orderBy("change_type")
    )


# --------------------------------------------------------------------------
# q73 — mergeable rollup merge (hypertable pattern): hourly partial states
# merged to daily WITHOUT re-reading raw events. The oracle aggregates the
# raw table straight to daily, so equality proves the partial states are
# lossless under the merge — including avg derived sum/count after the
# merge, never an average of averages.
# --------------------------------------------------------------------------
@register(
    "q73_rollup_merge",
    oracle="""
    -- sum/avg via CENTS INTEGERS (r12 sf0.001 sweep): event values are
    -- exact 2dp, so FLOOR(sum*100 + 0.5) absorbs the engines' float-sum
    -- ulp (1e-10 against a 0.5 boundary) into one exact BIGINT; the
    -- emitted doubles are then IDENTICAL-OPERAND divisions, which IEEE
    -- makes bit-equal on both engines. The previous ROUND(sum/cnt, 4)
    -- hit an exact 5th-decimal-5 tie at sf0.001 (307.03/8 = 38.37875),
    -- where Spark's shortest-repr HALF_UP and DuckDB's binary rounding
    -- disagree.
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           event_type,
           COUNT(value) AS cnt,
           CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) / 100.0
             AS sum_value,
           CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) / 100.0
             / COUNT(value) AS avg_value,
           ROUND(MIN(value), 4) AS min_value,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="hour→day mergeable rollup == direct daily aggregation",
)
def q73_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.rollup import (
        merge_rollup,
        time_rollup_partials,
    )

    ev = read_table(spark, sf_dir, "events")
    hourly = time_rollup_partials(
        ev, "ts", keys=["event_type"], value_col="value", grain="hour"
    )
    daily = merge_rollup(hourly, keys=["event_type"], grain="day")
    # cents-integer emission, mirroring the oracle expression-for-
    # expression so every float op runs on identical operands (comment
    # on the oracle above)
    cents = F.floor(F.col("sum_v") * 100 + 0.5).cast("long")
    return (
        daily.select(
            F.date_format("bucket", "yyyy-MM-dd").alias("day"),
            "event_type",
            "cnt",
            (cents / 100.0).alias("sum_value"),
            (cents / 100.0 / F.col("cnt")).alias("avg_value"),
            F.round("min_v", 4).alias("min_value"),
            F.round("max_v", 4).alias("max_value"),
        )
        .orderBy("day", "event_type")
    )
