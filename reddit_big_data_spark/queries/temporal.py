"""Temporal queries (F1-F7 + U1 rewrites) over `events` and `orders`.

DuckDB/Spark semantic alignment notes:
- Spark `dayofweek` is 1=Sunday..7=Saturday; DuckDB `dayofweek` is
  0=Sunday..6=Saturday, so the oracle uses `dayofweek(ts)+1`.
- Session timezone is pinned UTC (registry wrapper), so `hour`/`to_date`
  see the same wall-clock as DuckDB's naive timestamps.
- Spark `unix_timestamp` truncates to seconds; DuckDB `epoch` keeps
  fractional seconds — day-level floors agree for positive epochs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.operators.temporal import day_type, season, time_slot
from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table

_TIME_SLOT_SQL = """
    CASE WHEN hour(ts) >= 21 THEN 'night'
         WHEN hour(ts) >= 18 THEN 'evening'
         WHEN hour(ts) >= 15 THEN 'late_afternoon'
         WHEN hour(ts) >= 12 THEN 'afternoon'
         WHEN hour(ts) >= 9  THEN 'late_morning'
         WHEN hour(ts) >= 6  THEN 'morning'
         WHEN hour(ts) >= 3  THEN 'early_morning'
         ELSE 'late_night' END
"""


# --------------------------------------------------------------------------
# q02 — time-slot bucketing over an event stream: the reference's comment
# time-slot histogram (code/eda/project_eda.py:1010-1045) with the U1 UDFs
# replaced by native when-chains, plus range/IN predicates
# (code/nlp/Data_Gathering.py:42-43; code/eda/project_eda.py:550-555) and
# INTERVAL arithmetic (code/eda/project_eda.py:286).
# --------------------------------------------------------------------------
@register(
    "q02_time_slot_histogram",
    oracle=f"""
    SELECT {_TIME_SLOT_SQL} AS time_slot,
           CASE WHEN (dayofweek(ts) + 1) IN (1, 7) THEN 'weekend'
                ELSE 'weekday' END AS day_type,
           COUNT(*) AS cnt,
           ROUND(AVG(value), 4) AS avg_value,
           COUNT(DISTINCT user_id) AS nd_users,
           COUNT(DISTINCT CAST(ts - INTERVAL 5 HOUR AS DATE)) AS nd_shifted_dates
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-25'
      AND event_type IN ('click', 'view', 'purchase')
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="when-chain time features + range/IN filters + interval shift (F1-F7,U1)",
)
def q02_time_slot_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    ts = F.col("ts")
    return (
        ev.filter(
            (ts >= F.lit("2024-01-05").cast("timestamp"))
            & (ts < F.lit("2024-01-25").cast("timestamp"))
            & F.col("event_type").isin("click", "view", "purchase")
        )
        .withColumn("time_slot", time_slot(F.hour(ts)))
        .withColumn("day_type", day_type(F.dayofweek(ts)))
        .groupBy("time_slot", "day_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.countDistinct("user_id").alias("nd_users"),
            F.countDistinct(
                F.to_date(ts - F.expr("INTERVAL 5 HOURS"))
            ).alias("nd_shifted_dates"),
        )
        .orderBy("time_slot", "day_type")
    )


# --------------------------------------------------------------------------
# q17 — calendar features over years of order dates: month/season buckets
# (U1 get_season), day/month names (F5 date_format 'E'/'MMMM',
# code/eda/project_eda.py:702-717), epoch-day floor (F1/F2 unix round trip).
# --------------------------------------------------------------------------
@register(
    "q17_calendar_features",
    oracle="""
    SELECT CASE WHEN month(o_orderdate) IN (12, 1, 2) THEN 'winter'
                WHEN month(o_orderdate) IN (3, 4, 5)  THEN 'spring'
                WHEN month(o_orderdate) IN (6, 7, 8)  THEN 'summer'
                ELSE 'fall' END AS season,
           strftime(o_orderdate, '%B') AS month_name,
           strftime(o_orderdate, '%a') AS day_name,
           COUNT(*) AS cnt,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           COUNT(DISTINCT CAST(FLOOR(epoch(o_orderdate) / 86400) AS BIGINT)) AS nd_epoch_days
    FROM orders
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc="season/month/day-name buckets + epoch-day round trip (F1-F5,U1)",
)
def q17_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        orders.withColumn("season", season(F.month(d)))
        .withColumn("month_name", F.date_format(d, "MMMM"))
        .withColumn("day_name", F.date_format(d, "E"))
        .groupBy("season", "month_name", "day_name")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.countDistinct(F.floor(F.unix_timestamp(d) / 86400)).alias("nd_epoch_days"),
        )
        .orderBy("season", "month_name", "day_name")
    )


# --------------------------------------------------------------------------
# q92 — time-series gap fill + forward fill: build the dense hourly grid
# (distinct keys x sequence(min_hour, max_hour)), left-join the actual
# hourly aggregate, and carry the last observation forward with an
# IGNORE NULLS window — the standard warehouse resample. Scale shape: the
# grid is |keys| x |hours| rows built from a 1-row bounds aggregate (no
# scan of raw data to enumerate hours); the fill window is partitioned
# per key. Hourly sums round to 4dp on both sides before the final sum
# so engine summation order cannot move the 2dp output.
# --------------------------------------------------------------------------
@register(
    "q92_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, ROUND(SUM(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT MIN(date_trunc('hour', ts)) AS lo,
             MAX(date_trunc('hour', ts)) AS hi FROM events
    ),
    grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
                  FROM bounds) g
    ),
    joined AS (
      SELECT g.event_type, hourly.v,
             last_value(hourly.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.h
               ROWS UNBOUNDED PRECEDING) AS v_filled
      FROM grid g LEFT JOIN hourly
        ON hourly.event_type = g.event_type AND hourly.h = g.h
    )
    SELECT event_type, COUNT(*) AS n_hours,
           CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
           ROUND(SUM(v_filled), 2) AS filled_sum
    FROM joined GROUP BY event_type ORDER BY event_type
    """,
    doc="dense-grid resample + last-observation-carried-forward fill",
)
def q92_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
    )
    hourly = ev.groupBy("event_type", "h").agg(
        F.round(F.sum("value"), 4).alias("v")
    )
    bounds = ev.agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_gaps"),
            F.round(F.sum("v_filled"), 2).alias("filled_sum"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q157 — sample AUTOCORRELATION (ACF) of the daily revenue series at
# calendar lags 1..7 — the time-series diagnostic behind seasonality
# detection and forecasting-model selection (a weekly cycle surfaces as
# a lag-7 peak). Complements q151's rolling window with the
# correlation-structure view of the same daily aggregate.
#
# Numerics (q141's recipe): daily revenue is an EXACT integer-cents
# sum; the mean enters every term as the identical one-division
# expression; the lag-k products and the variance terms fold in
# canonical day order (<= |days| addends) before the single 6dp-rounded
# ratio. Lag pairing is an EQUI-join on day-ordinal + k (gaps in the
# calendar simply drop pairs, reported via n_pairs) — no range join,
# no corpus-wide window.
#
# Scale shape: everything after the one corpus scan operates on the
# |days|-row daily table (persisted once for its four consumers).
# --------------------------------------------------------------------------
@register(
    "q157_daily_acf",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS x
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    scal AS (SELECT COUNT(*) AS n, SUM(x) AS s FROM daily),
    centered AS (
      SELECT (day - DATE '1970-01-01') AS d,
             x - CAST(s.s AS DOUBLE) / s.n AS c
      FROM daily, scal s
    ),
    den AS (SELECT LIST_SUM(LIST(c * c ORDER BY d)) AS den FROM centered),
    pairs AS (
      SELECT CAST(k.k AS INT) AS lag, a.d, a.c * b.c AS t
      FROM centered a
      CROSS JOIN (SELECT UNNEST(RANGE(1, 8)) AS k) k
      JOIN centered b ON b.d = a.d + k.k
    ),
    num AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             LIST_SUM(LIST(t ORDER BY d)) AS num
      FROM pairs GROUP BY lag
    )
    SELECT lag, n_pairs, ROUND(num / den.den, 6) AS acf
    FROM num CROSS JOIN den
    ORDER BY lag
    """,
    doc="daily-revenue autocorrelation at calendar lags 1..7 "
    "(seasonality diagnostic; exact-cents series, canonical folds)",
)
def q157_daily_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(cents).alias("x"))
        .persist()  # two consumers: the (n, s) scalars and `centered`
    )
    scal = daily.agg(F.count("*").alias("n"), F.sum("x").alias("s"))
    centered = (
        daily.crossJoin(F.broadcast(scal))
        .select(
            F.unix_date("day").alias("d"),
            (
                F.col("x") - F.col("s").cast("double") / F.col("n")
            ).alias("c"),
        )
        .persist()  # three consumers: variance fold, lag-join a and b
    )

    def _fold(expr):
        # canonical day-ordered fold (q141's recipe)
        return F.aggregate(
            F.sort_array(F.collect_list(F.struct("d", expr.alias("v")))),
            F.lit(0.0),
            lambda a, s: a + s["v"],
        )

    den = centered.agg(_fold(F.col("c") * F.col("c")).alias("den"))
    a = centered.select(
        "d",
        F.col("c").alias("ca"),
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
    ).withColumn("d_tgt", F.col("d") + F.col("lag"))
    b = centered.select(
        F.col("d").alias("d_tgt"), F.col("c").alias("cb")
    )
    num = (
        a.join(b, "d_tgt")
        .select("lag", "d", (F.col("ca") * F.col("cb")).alias("t"))
        .groupBy("lag")
        .agg(
            F.count("*").alias("n_pairs"),
            _fold(F.col("t")).alias("num"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            F.round(F.col("num") / F.col("den"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


# --------------------------------------------------------------------------
# q163 — CUSUM CHANGEPOINT on daily revenue (round 10): the classic
# level-shift detector a pipeline-monitoring stack runs over every daily
# metric. Method: C_t = cumsum(x - xbar) peaks exactly where the series'
# mean shifts (Page's CUSUM, offline form); the changepoint estimate is
# argmax_t |C_t|, reported with the mean before/after the split.
#
# EXACT-INTEGER discipline: x is exact cents; instead of subtracting the
# fractional mean, both engines compare D_t = nd * cumsum(x) - t * total
# (= nd * C_t scaled by the day count) in decimal(38,0) / HUGEINT — the
# argmax over |D_t| is an integer comparison, so the chosen changepoint
# day cannot drift by a ulp. Ties break to the earliest day. The only
# floats are three final rounded divisions of exact integers.
#
# Scale shape: one shuffle to the per-DAY aggregate (calendar-bounded at
# any corpus scale — the q08 tiny-window pattern for the prefix sums),
# argmax via orderBy+limit(1) (TakeOrdered, no full sort materialized),
# scalars attached by constant-key broadcast-hash joins.
# --------------------------------------------------------------------------
@register(
    "q163_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT day, rev,
             ROW_NUMBER() OVER (ORDER BY day) AS t,
             SUM(rev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cs
      FROM daily
    ),
    tot AS (SELECT COUNT(*) AS nd, SUM(rev) AS total FROM daily),
    dev AS (
      SELECT day, nd,
             ABS(CAST(nd AS HUGEINT) * cs - CAST(t AS HUGEINT) * total)
               AS ad
      FROM idx, tot
    ),
    peak AS (SELECT day AS cp, nd, ad FROM dev ORDER BY ad DESC, day LIMIT 1)
    SELECT strftime(peak.cp, '%Y-%m-%d') AS change_day,
           CAST(peak.nd AS BIGINT) AS n_days,
           ROUND(CAST(peak.ad AS DOUBLE) / peak.nd / 100.0, 2)
             AS cusum_peak,
           ROUND(CAST(SUM(CASE WHEN day <= peak.cp THEN rev END) AS DOUBLE)
                 / COUNT(CASE WHEN day <= peak.cp THEN 1 END) / 100.0, 2)
             AS before_mean,
           ROUND(CAST(SUM(CASE WHEN day > peak.cp THEN rev END) AS DOUBLE)
                 / COUNT(CASE WHEN day > peak.cp THEN 1 END) / 100.0, 2)
             AS after_mean
    FROM daily, peak
    GROUP BY peak.cp, peak.nd, peak.ad
    """,
    doc="offline CUSUM changepoint on daily revenue: integer-exact "
    "argmax of |nd*cumsum - t*total|, before/after means",
)
def q163_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(cents).alias("rev"))
        .persist()  # three consumers: prefix index, totals, side means
    )
    return cusum_changepoint(daily)


def cusum_changepoint(daily: DataFrame) -> DataFrame:
    """Offline CUSUM changepoint over a (day: date, rev: long cents)
    series — the detector math, factored so the property suite can
    drive it with arbitrary series (tests/test_properties.py) and any
    daily metric can reuse it. See the q163 header for the
    integer-exactness discipline. `daily` should be persisted by the
    caller when it is derived (three consumers below)."""
    from pyspark.sql import Window

    from reddit_big_data_spark.operators.attach import (
        attach_constant_row,
        with_constant_key,
    )

    w_ord = Window.orderBy("day")
    idx = daily.select(
        "day",
        F.row_number().over(w_ord).alias("t"),
        F.sum("rev")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cs"),
    )
    tot = daily.agg(
        F.count("*").alias("nd"), F.sum("rev").alias("total")
    )
    dev = attach_constant_row(idx, with_constant_key(tot), "t")
    ad = F.abs(
        F.col("nd").cast("decimal(38,0)") * F.col("cs")
        - F.col("t").cast("decimal(38,0)") * F.col("total")
    )
    peak = (
        dev.select(F.col("day").alias("cp"), "nd", ad.alias("ad"))
        .orderBy(F.desc("ad"), "cp")
        .limit(1)
    )
    sided = attach_constant_row(daily, with_constant_key(peak), "rev")
    before = F.when(F.col("day") <= F.col("cp"), F.col("rev"))
    after = F.when(F.col("day") > F.col("cp"), F.col("rev"))
    return (
        sided.groupBy("cp", "nd", "ad")
        .agg(
            F.sum(before).alias("__bsum"),
            F.count(before).alias("__bn"),
            F.sum(after).alias("__asum"),
            F.count(after).alias("__an"),
        )
        .select(
            F.date_format("cp", "yyyy-MM-dd").alias("change_day"),
            F.col("nd").cast("long").alias("n_days"),
            F.round(
                F.col("ad").cast("double") / F.col("nd") / 100.0, 2
            ).alias("cusum_peak"),
            F.round(
                F.col("__bsum").cast("double") / F.col("__bn") / 100.0, 2
            ).alias("before_mean"),
            F.round(
                F.col("__asum").cast("double") / F.col("__an") / 100.0, 2
            ).alias("after_mean"),
        )
    )
