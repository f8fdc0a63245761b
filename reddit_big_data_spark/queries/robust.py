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


# --------------------------------------------------------------------------
# q90 — MAD-based robust outlier flags: median and median-absolute-
# deviation per group (two exact-median passes — the first aggregates the
# group medians, broadcast back; the second aggregates the absolute
# deviations), then count rows beyond 1 robust-sigma (1.4826·MAD). The
# robust counterpart of z-scores: one wild row moves a mean/stddev fence,
# but not a median/MAD fence. The uniform testdata has no 3-sigma tail,
# so the reported fence is 1 sigma — the CHECK is about the machinery,
# not the threshold.
# --------------------------------------------------------------------------
@register(
    "q90_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, MEDIAN(l_extendedprice) AS med
      FROM lineitem GROUP BY l_returnflag
    ),
    dev AS (
      SELECT l.l_returnflag, ABS(l_extendedprice - med) AS adev
      FROM lineitem l JOIN med USING (l_returnflag)
    ),
    mad AS (
      SELECT d.l_returnflag, ANY_VALUE(m.med) AS med, MEDIAN(d.adev) AS mad
      FROM dev d JOIN med m USING (l_returnflag) GROUP BY d.l_returnflag
    )
    SELECT x.l_returnflag, COUNT(*) AS n,
           ROUND(ANY_VALUE(m.med), 2) AS med,
           ROUND(ANY_VALUE(m.mad), 2) AS mad,
           CAST(SUM(CASE WHEN ABS(x.l_extendedprice - m.med) > 1.4826 * m.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond_1s
    FROM lineitem x JOIN mad m USING (l_returnflag)
    GROUP BY x.l_returnflag
    ORDER BY x.l_returnflag
    """,
    doc="median/MAD robust outlier fence per group (two exact-median passes)",
)
def q90_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag")
    mad = dev.groupBy("l_returnflag").agg(
        F.first("med").alias("med"),
        F.expr("percentile(abs(l_extendedprice - med), 0.5)").alias("mad"),
    )
    return (
        li.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("med"), 2).alias("med"),
            F.round(F.first("mad"), 2).alias("mad"),
            F.sum(
                (
                    F.abs(F.col("l_extendedprice") - F.col("med"))
                    > 1.4826 * F.col("mad")
                ).cast("long")
            ).alias("n_beyond_1s"),
        )
        .orderBy("l_returnflag")
    )
