"""Robust statistics: per-group winsorization via exact percentiles.

The reference's EDA notebooks eyeball outliers with describe() and drop
them by hand-picked literals (code/project_eda.ipynb cell 14); this is
the principled distributed version — clamp each group's tail at its own
exact p05/p95. Spark's `percentile` and DuckDB's `quantile_cont` both
use linear interpolation on the sorted values, so the bounds agree
bit-for-bit (verified, not assumed) and the query carries a full oracle.

Scale shape: exact percentiles need one sort-based aggregate per group
(Spark's ObjectHashAggregate over a digest of group values); the bounds
table is one row per group — broadcast back onto the fact scan, which is
read a second time but never shuffled for the clamp pass. At 100 TB you
would swap `percentile` for `approx_percentile` (t-digest, mergeable,
single pass) and keep the identical plan shape; the exact form is what
makes the oracle check possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q81 — winsorized group means: exact p05/p95 per return flag, clamp, and
# report the shift the tails were causing.
# --------------------------------------------------------------------------
@register(
    "q81_winsorized_stats",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS p05,
             quantile_cont(l_extendedprice, 0.95) AS p95
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag, COUNT(*) AS n,
           ROUND(ANY_VALUE(b.p05), 2) AS p05,
           ROUND(ANY_VALUE(b.p95), 2) AS p95,
           ROUND(AVG(l_extendedprice), 2) AS mean_raw,
           ROUND(AVG(LEAST(GREATEST(l_extendedprice, b.p05), b.p95)), 2)
             AS mean_winsorized
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="per-group exact-percentile winsorization (clamped mean vs raw)",
)
def q81_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    bounds = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.05, 0.95))").alias("p")
    ).select(
        "l_returnflag", F.col("p")[0].alias("p05"), F.col("p")[1].alias("p95")
    )
    clamped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95")
    )
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("p05"), 2).alias("p05"),
            F.round(F.first("p95"), 2).alias("p95"),
            F.round(F.avg("l_extendedprice"), 2).alias("mean_raw"),
            F.round(F.avg(clamped), 2).alias("mean_winsorized"),
        )
        .orderBy("l_returnflag")
    )
