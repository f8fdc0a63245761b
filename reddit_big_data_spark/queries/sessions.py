"""Sessionization + as-of join queries over `events` — both fully
oracle-checked (gaps-and-islands is plain window SQL; DuckDB has a native
ASOF JOIN to pin ours against)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.operators.temporal_joins import asof_join, sessionize
from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import from_rows, read_table

# value tiers for the range join (half-open [lo, hi))
_TIERS = [
    (0.0, 50.0, "low"),
    (50.0, 150.0, "mid"),
    (150.0, 300.0, "high"),
    (300.0, 1000.0, "top"),
]


# --------------------------------------------------------------------------
# q53 — sessionization with a 30-minute inactivity gap, per-user windows
# only (parallel across users). Output: session-length distribution.
# --------------------------------------------------------------------------
@register(
    "q53_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events,
             SUM(value) AS sess_value,
             date_diff('second', MIN(ts), MAX(ts)) AS dur_s
      FROM sess GROUP BY 1, 2
    )
    SELECT n_events,
           COUNT(*) AS n_sessions,
           ROUND(AVG(sess_value), 4) AS avg_value,
           ROUND(AVG(dur_s), 4) AS avg_duration_s
    FROM per_session
    GROUP BY n_events
    ORDER BY n_events
    """,
    doc="gaps-and-islands sessionization, 30-min gap; session-size histogram",
)
def q53_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    sess = sessionize(ev, "user_id", "ts", gap="30 minutes")
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sess_value"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("dur_s"),
    )
    return (
        per_session.groupBy("n_events")
        .agg(
            F.count("*").alias("n_sessions"),
            F.round(F.avg("sess_value"), 4).alias("avg_value"),
            F.round(F.avg("dur_s"), 4).alias("avg_duration_s"),
        )
        .orderBy("n_events")
    )


# --------------------------------------------------------------------------
# q54 — as-of join: each purchase picks the same user's most recent prior
# (or simultaneous) click. Ours: tagged-union + carry-forward window (one
# shuffle on user_id). Oracle: DuckDB's native ASOF JOIN.
# --------------------------------------------------------------------------
@register(
    "q54_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts AS click_ts, value AS click_value
      FROM events WHERE event_type = 'click'
    ),
    matched AS (
      SELECT p.user_id, p.event_id, c.click_ts, c.click_value
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.click_ts
    )
    SELECT user_id,
           COUNT(*) AS purchases,
           COUNT(click_ts) AS matched,
           ROUND(SUM(COALESCE(click_value, 0)), 4) AS sum_click_value
    FROM matched
    GROUP BY user_id
    HAVING COUNT(*) > 2
    ORDER BY user_id
    """,
    doc="as-of join (most recent prior click per purchase) vs DuckDB ASOF JOIN",
)
def q54_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"), F.col("value").alias("click_value"))
    )
    matched = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_ts", "click_value"],
    )
    return (
        matched.groupBy("user_id")
        .agg(
            F.count("*").alias("purchases"),
            F.count("click_ts").alias("matched"),
            F.round(F.sum(F.coalesce("click_value", F.lit(0.0))), 4).alias(
                "sum_click_value"
            ),
        )
        .filter(F.col("purchases") > 2)
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# q56 — range join: events bucketed into value tiers ([lo, hi) intervals)
# WITHOUT a nested-loop join — ranges explode into fixed-width buckets,
# points equi-join on their bucket, exact predicate filters. The tier dim
# arrives via driver-rows ingest (S7).
# --------------------------------------------------------------------------
@register(
    "q56_range_join",
    oracle="""
    WITH tiers(lo, hi, tier) AS (
      VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'),
             (150.0, 300.0, 'high'), (300.0, 1000.0, 'top')
    )
    -- SUM, not AVG: values carry exactly 2 decimals, so a sum can never
    -- sit on a rounding boundary — but sum/count can land EXACTLY on one
    -- (measured: avg 194.59325 rounded differently per engine from
    -- last-ulp summation-order noise).
    SELECT t.tier, e.event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="bucketed range join into [lo,hi) tiers — no nested-loop (brief: range join)",
)
def q56_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.range_join import bucketed_range_join

    ev = read_table(spark, sf_dir, "events")
    tiers = from_rows(spark, _TIERS, "lo: double, hi: double, tier: string")
    joined = bucketed_range_join(ev, tiers, "value", "lo", "hi", bucket_width=50.0)
    return (
        joined.groupBy("tier", "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("tier", "event_type")
    )
