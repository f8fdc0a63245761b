"""Window-function queries (W1-W4, A9/A10 + lead/lag/ntile extension).

The reference's windows: running sum/count per author ordered by
created_utc with a RANGE unbounded-preceding frame
(code/eda/project_eda.py:482-510), row_number ranking for per-group top-k
(code/nlp/NFL_Processing.py:502-506), and a pandas-side cumsum
(code/nlp/NFL_Processing.py:62) that we move into Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q08 — histogram on a derived bucket + cumulative count (A9 + A10). The
# reference buckets comment length then cumsums in pandas; here the cumsum
# is a window over the aggregated (tiny) bucket table — the window runs on
# ~dozens of rows regardless of input scale.
# --------------------------------------------------------------------------
@register(
    "q08_histogram_cumulative",
    oracle="""
    WITH hist AS (
      SELECT CAST(FLOOR(n_chars / 100) AS BIGINT) AS bucket,
             COUNT(*) AS cnt,
             ROUND(AVG(len(string_split(text, ' '))), 4) AS avg_tokens
      FROM documents
      GROUP BY 1
    )
    SELECT bucket, cnt, avg_tokens,
           -- DuckDB promotes windowed SUM(BIGINT) to HUGEINT (-> float64 in
           -- fetchdf); Spark stays bigint. Cast so the hash-compare agrees.
           CAST(SUM(cnt) OVER (ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
    FROM hist
    ORDER BY bucket
    """,
    doc="width-bucket histogram + cumulative count window (A9+A10+F10+F11)",
)
def q08_histogram_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    hist = (
        docs.withColumn("bucket", F.floor(F.col("n_chars") / 100))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg(F.size(F.split(F.col("text"), " "))), 4).alias("avg_tokens"),
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return hist.withColumn("cum_cnt", F.sum("cnt").over(w)).orderBy("bucket")


# --------------------------------------------------------------------------
# q10 — running sum + running count per partition with a RANGE
# unbounded-preceding frame — the exact spec of the reference's
# author-aggregate windows (code/eda/project_eda.py:482-483,509-510),
# customer standing in for author, order date for created_utc.
# --------------------------------------------------------------------------
@register(
    "q10_running_aggregates",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER w, 2) AS running_total,
           COUNT(o_totalprice) OVER w AS running_cnt
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
    doc="running sum/count, RANGE unbounded-preceding frame (W1+W2)",
)
def q10_running_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
            F.count("o_totalprice").over(w).alias("running_cnt"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# q11 — per-group top-k via row_number (W3+W4,
# code/nlp/NFL_Processing.py:502-506): top-5 parts per brand by retail
# price, deterministic tie-break on key.
# --------------------------------------------------------------------------
@register(
    "q11_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, ROUND(p_retailprice, 2) AS price,
           CAST(rn AS INTEGER) AS rn
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
    )
    WHERE rn <= 5
    ORDER BY p_brand, rn
    """,
    doc="row_number ranking + rank filter = top-k per group (W3+W4)",
)
def q11_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "p_brand",
            "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            F.col("rn").cast("int").alias("rn"),
        )
        .orderBy("p_brand", "rn")
    )


# --------------------------------------------------------------------------
# q18 — lead/lag/ntile extension (frames absent from the reference,
# SURVEY.md §2.5): inter-order gap days per customer and revenue quartiles.
# --------------------------------------------------------------------------
@register(
    "q18_lag_ntile",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
                       CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS DATE),
                       CAST(o_orderdate AS DATE)) AS gap_days,
             NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
             o_totalprice
      FROM orders
    )
    SELECT CAST(quartile AS INTEGER) AS quartile,
           COUNT(*) AS cnt,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           ROUND(AVG(gap_days), 4) AS avg_gap_days
    FROM gaps
    GROUP BY 1
    ORDER BY 1
    """,
    doc="lag gap-days + ntile quartiles (§2.5 extension)",
)
def q18_lag_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.ranking import with_global_ntile

    orders = read_table(spark, sf_dir, "orders")
    w_lag = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # Global NTILE via the distributed two-phase ranker (operators/ranking.py)
    # instead of ntile().over(Window.orderBy(...)), which would sort the whole
    # table in ONE task at scale.
    tiled = with_global_ntile(
        orders, ["o_totalprice", "o_orderkey"], 4, ntile_col="quartile"
    )
    gaps = tiled.select(
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w_lag))
        ).alias("gap_days"),
        F.col("quartile").cast("int").alias("quartile"),
        "o_totalprice",
    )
    return (
        gaps.groupBy("quartile")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
        )
        .orderBy("quartile")
    )


# --------------------------------------------------------------------------
# q151 — time-based ROLLING window over an irregular daily series: 7-day
# trailing revenue and daily average per event type via a RANGE frame on
# the epoch-day ordinal (RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) —
# the frame is defined by TIME distance, so calendar gaps shrink the
# divisor instead of silently pulling in stale rows the way a ROWS frame
# would. Completes the window family (q10 runs unbounded frames, q18
# lag/ntile, q87 ranks): the bounded moving-aggregate shape every
# time-series dashboard runs.
#
# Numeric discipline: revenue is summed in integer CENTS (one identical
# round-to-cents expression per row on both engines), so the daily sums,
# the rolling sums, and the frame counts are all EXACT integers and the
# only float op is the final divide — no fold-order sensitivity at any
# scale. Scale shape: the window runs over the DAILY aggregate (bounded
# by days x types, never corpus rows), partitioned by type.
# --------------------------------------------------------------------------
@register(
    "q151_rolling_revenue",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS rev_cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    roll AS (
      SELECT event_type, day, rev_cents,
             SUM(rev_cents) OVER w AS roll7_cents,
             COUNT(*) OVER w AS roll7_days
      FROM daily
      WINDOW w AS (PARTITION BY event_type
                   ORDER BY (day - DATE '1970-01-01')
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(roll7_cents AS BIGINT) AS roll7_cents,
           CAST(roll7_days AS BIGINT) AS roll7_days,
           ROUND(CAST(roll7_cents AS DOUBLE) / roll7_days / 100.0, 4)
             AS roll7_daily_avg
    FROM roll
    ORDER BY event_type, day
    """,
    doc="7-day trailing revenue per type via a time-RANGE window frame "
    "over the daily aggregate (integer-cents exact arithmetic)",
)
def q151_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_date("day"))
        .rangeBetween(-6, 0)
    )
    roll = daily.select(
        "event_type",
        "day",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("roll7_cents"),
        F.count("*").over(w).alias("roll7_days"),
    )
    return roll.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "rev_cents",
        "roll7_cents",
        "roll7_days",
        F.round(
            F.col("roll7_cents").cast("double")
            / F.col("roll7_days")
            / 100.0,
            4,
        ).alias("roll7_daily_avg"),
    ).orderBy("event_type", "day")
