"""Events-table queries: JSON parsing (from_json / get_json_object over
`events.props`), nested field access, and the tumbling-window aggregation
that is the batch twin of the streaming extension.

The reference never parses JSON (its nested data arrives pre-parsed from
parquet, SURVEY.md §2.8) but DOES unpack nested structs via UDFs
(code/nlp/Sentiment_Analysis.py:84-94) and explodes nested arrays
(code/ml/Cleaning&Prepping_Data_ML.py:68); here both are native
expressions over the driver testdata's JSON `props` column (F19/F20 +
the §2.12 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


# --------------------------------------------------------------------------
# q50 — JSON parse + nested access: from_json(props) -> struct, field access
# via dot path (the native rewrite of the reference's U2 struct-extractor
# UDFs), plus get_json_object as the schema-less alternative, aggregated
# per event_type.
# --------------------------------------------------------------------------
@register(
    "q50_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           -- unrounded integer-ratio avg (r12): both engines divide the
           -- same exact integers, so the doubles are bit-equal; ROUND@4
           -- was a structural tie for 2,5-smooth group counts
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)
             / COUNT(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS avg_k,
           CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
                      THEN 1 END) AS BIGINT) AS high_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="from_json struct parse + dot-path access + get_json_object (F19/F20/§2.8)",
)
def q50_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", PROPS_SCHEMA))
    # schema-less path for one aggregate, proving both APIs:
    k_json = F.get_json_object("props", "$.k").cast("int")
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("p.k")).alias("sum_k"),
            # unrounded integer-ratio avg (see the oracle comment)
            (F.sum(F.col("p.k")).cast("double") / F.count(F.col("p.k"))).alias(
                "avg_k"
            ),
            F.count(F.when(k_json > 50, True)).alias("high_k"),
            F.max(F.col("p.k")).alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q51 — tumbling-window aggregation over event time: the batch twin of the
# streaming extension (§2.12). Uses F.window (epoch-aligned 6h tumbling
# windows), the same operator the stream runs with a watermark.
# --------------------------------------------------------------------------
@register(
    "q51_tumbling_windows",
    oracle="""
    -- window_start as epoch seconds: raw timestamp columns reach pandas at
    -- different resolutions (ns vs us) per engine, which an exact
    -- hash-compare may treat as different; BIGINT sidesteps that.
    SELECT CAST(FLOOR(epoch(ts) / 21600) * 21600 AS BIGINT) AS window_start,
           event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="tumbling event-time windows (batch twin of the streaming path, §2.12)",
)
def q51_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# q55 — hypertable-style multi-granularity rollup: ONE pass produces 1h /
# 6h / 1d aggregates via GROUPING SETS over derived buckets (the
# continuous-aggregate shape). Exercises the spark.sql() entry path (E1's
# SQL twin) over a temp view.
# --------------------------------------------------------------------------
@register(
    "q55_time_rollup",
    oracle="""
    WITH b AS (
      SELECT event_type, value,
             CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT)  AS h1,
             CAST(FLOOR(epoch(ts) / 21600) * 21600 AS BIGINT) AS h6,
             CAST(FLOOR(epoch(ts) / 86400) * 86400 AS BIGINT) AS d1
      FROM events
    )
    SELECT COALESCE(CAST(h1 AS VARCHAR), '') AS h1_bucket,
           COALESCE(CAST(h6 AS VARCHAR), '') AS h6_bucket,
           COALESCE(CAST(d1 AS VARCHAR), '') AS d1_bucket,
           event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 4) AS sum_value
    FROM b
    GROUP BY GROUPING SETS ((h1, event_type), (h6, event_type), (d1, event_type))
    ORDER BY h1_bucket, h6_bucket, d1_bucket, event_type
    """,
    doc="multi-granularity (1h/6h/1d) rollup in one pass via GROUPING SETS",
)
def q55_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__events_rollup")
    return spark.sql(
        """
        WITH b AS (
          SELECT event_type, value,
                 CAST(FLOOR(unix_timestamp(ts) / 3600) * 3600 AS BIGINT)   AS h1,
                 CAST(FLOOR(unix_timestamp(ts) / 21600) * 21600 AS BIGINT) AS h6,
                 CAST(FLOOR(unix_timestamp(ts) / 86400) * 86400 AS BIGINT) AS d1
          FROM __events_rollup
        )
        SELECT COALESCE(CAST(h1 AS STRING), '') AS h1_bucket,
               COALESCE(CAST(h6 AS STRING), '') AS h6_bucket,
               COALESCE(CAST(d1 AS STRING), '') AS d1_bucket,
               event_type,
               COUNT(*) AS cnt,
               ROUND(SUM(value), 4) AS sum_value
        FROM b
        GROUP BY GROUPING SETS ((h1, event_type), (h6, event_type), (d1, event_type))
        ORDER BY h1_bucket, h6_bucket, d1_bucket, event_type
        """
    )


# --------------------------------------------------------------------------
# q59 — mergeable HLL sketch rollup (operators/sketches.py): distinct users
# per event_type computed by UNIONING per-day sketches, never re-scanning
# raw rows — the pre-aggregation pattern that keeps 100 TB distinct-count
# metrics O(days x sketch_size). Oracle contract (the q88 pattern):
# Datasketches HLL binaries are not reproducible in DuckDB, so the query
# emits the SQL-checkable exact values plus a boolean asserting the
# merged estimate landed within 5% relative error (Datasketches default
# lgK=12 -> RSE ~1.6%; observed error at testdata scale is 0 — the
# sketch is exact below ~2.5k distincts). Merge == single-shot stays
# pinned in tests/test_sketches.py.
# --------------------------------------------------------------------------
@register(
    "q59_sketch_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_nd,
           TRUE AS nd_within_bound
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="two-level HLL sketch rollup: per-day sketches -> union -> estimate, "
    "error-bound boolean vs exact",
)
def q59_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.sketches import distinct_rollup

    ev = read_table(spark, sf_dir, "events")
    return (
        distinct_rollup(ev, "event_type", "user_id")
        .select(
            "event_type",
            "n_days",
            "exact_nd",
            (
                F.abs(F.col("approx_nd") - F.col("exact_nd"))
                <= 0.05 * F.col("exact_nd")
            ).alias("nd_within_bound"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q64 — two-phase salted aggregation as an oracle query: the skew-mitigation
# shape (operators/skew.py) is REASSOCIATION-EQUIVALENT to the plain GROUP
# BY — count/min/max exact, float sum/avg equal up to float-addition
# reassociation (the same semantics plain Spark partial aggregation
# already has; VERDICT r10). Phase 1 splits each hot key across 16 salt
# reducers, phase 2 combines at most 16 partials per key. The oracle IS
# the plain GROUP BY with both sides ROUNDed well inside the
# reassociation noise floor, so this checks algebraic-decomposition
# correctness (sum/count/min/max + avg via sum-of-sums / sum-of-counts),
# not just plumbing.
# --------------------------------------------------------------------------
@register(
    "q64_salted_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS sum_value,
           -- avg derived UNROUNDED from the 2dp-rounded sum (r12): the
           -- 2dp sum is on-grid and engine-identical (noise << half a
           -- cent), so the division runs on identical operands; rounding
           -- the quotient itself was a structural tie whenever the group
           -- count is 2,5-smooth (the q73 lesson)
           ROUND(SUM(value), 2) / COUNT(*) AS avg_value,
           ROUND(MIN(value), 4) AS min_value,
           ROUND(MAX(value), 4) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="two-phase salted aggregation ≡ plain GROUP BY up to float "
    "reassociation (skew mitigation; exact for count/min/max)",
)
def q64_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.skew import salted_aggregate

    ev = read_table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        aggs={
            "cnt": ("count", "event_id"),  # non-null key == COUNT(*)
            "sum_value": ("sum", "value"),
            "avg_value": ("avg", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
    )
    return out.select(
        "event_type",
        "cnt",
        F.round("sum_value", 2).alias("sum_value"),
        # unrounded quotient of the 2dp sum (see the oracle comment)
        (F.round("sum_value", 2) / F.col("cnt")).alias("avg_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# q124 — corpus NOVELTY CURVE: per ingest day, how many active users are
# seen for the FIRST time — the crawl-monitoring report a continuous
# data pipeline tracks (novelty decay tells you when a source is mined
# out and further crawling mostly yields duplicates; the user/day grain
# here stands in for url/snapshot). First-seen comes from one min-day
# aggregate over the distinct (day, user) grid — never a corpus-wide
# window — and the day rollup joins it back on the user key.
# --------------------------------------------------------------------------
@register(
    "q124_novelty_curve",
    oracle="""
    WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    fs AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           -- unrounded integer ratio (r12): identical integer operands
           -- divide to bit-equal doubles; ROUND@4 was a structural tie
           -- for 2,5-smooth daily actives (e.g. 3/32 = 0.09375)
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS novelty
    FROM d JOIN fs USING (user_id)
    GROUP BY day ORDER BY day
    """,
    doc="per-day first-seen novelty curve (crawl-exhaustion monitoring)",
)
def q124_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    d = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    fs = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    new = (F.col("day") == F.col("first_day")).cast("long")
    return (
        d.join(fs, "user_id")
        .groupBy("day")
        .agg(
            F.count("*").alias("active_users"),
            F.sum(new).alias("new_users"),
            # unrounded integer ratio (see the oracle comment)
            (F.sum(new).cast("double") / F.count("*")).alias("novelty"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "active_users",
            "new_users",
            "novelty",
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# q143 — ordered conversion funnel (the MATCH_RECOGNIZE / funnel-analysis
# family): how many users did view -> click -> purchase IN THAT ORDER,
# where each step must occur strictly after the user's first completion
# of the previous step. The reference has no sequence analytics; this is
# the event-analytics extension every product pipeline runs daily.
#
# Single corpus scan, single shuffle: three stacked aggregate windows
# over the SAME partitionBy(user_id) (t2's predicate references t1, so
# they stack as sequential projections but share one Exchange), then a
# per-user collapse that reuses that partitioning. No self-joins, no
# collect_list of a user's history (a power user's event list is
# unbounded at 100 TB; the window aggregates never materialize it).
# --------------------------------------------------------------------------
@register(
    "q143_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS view_users,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS click_users,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS purchase_users,
           ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                 / NULLIF((SELECT COUNT(*) FROM v), 0), 6) AS conv_click,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / NULLIF((SELECT COUNT(*) FROM c), 0), 6) AS conv_purchase,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / NULLIF((SELECT COUNT(*) FROM v), 0), 6) AS conv_overall
    """,
    doc="ordered view->click->purchase funnel: per-step user counts + "
    "conversion rates (single-scan stacked-window sequence analytics)",
)
def q143_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
    )
    w = Window.partitionBy("user_id")
    is_type = lambda t: F.col("event_type") == t  # noqa: E731
    st = ev.withColumn("t1", F.min(F.when(is_type("view"), F.col("ts"))).over(w))
    # t2/t3 reference the previous step's window column: each is a new
    # projection layer, but all three windows share the user_id hash
    # partitioning — ONE exchange in the physical plan.
    st = st.withColumn(
        "t2",
        F.min(F.when(is_type("click") & (F.col("ts") > F.col("t1")), F.col("ts"))).over(w),
    )
    st = st.withColumn(
        "t3",
        F.min(F.when(is_type("purchase") & (F.col("ts") > F.col("t2")), F.col("ts"))).over(w),
    )
    # t1..t3 are constant per user; max() collapses without re-shuffling
    # (the groupBy key equals the window partitioning).
    per_user = st.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    counts = per_user.agg(
        F.count("t1").alias("view_users"),
        F.count("t2").alias("click_users"),
        F.count("t3").alias("purchase_users"),
    )
    return counts.select(
        "view_users",
        "click_users",
        "purchase_users",
        F.round(F.col("click_users") / F.nullif(F.col("view_users"), F.lit(0)), 6).alias("conv_click"),
        F.round(F.col("purchase_users") / F.nullif(F.col("click_users"), F.lit(0)), 6).alias("conv_purchase"),
        F.round(F.col("purchase_users") / F.nullif(F.col("view_users"), F.lit(0)), 6).alias("conv_overall"),
    )


# --------------------------------------------------------------------------
# q144 — cohort retention (first-purchase-day cohorts, day offsets 0-13):
# the other half of standard event analytics. Cohort = the day of a
# user's first purchase; retention(c, k) = fraction of cohort c's users
# who purchased again k days later. Day-grain purchase activity keeps
# the matrix non-degenerate on this data (every user is ACTIVE every
# week, but purchases only ~every other day).
#
# Scale shape: distinct (user, day) first (bounds everything downstream
# by active user-days, not raw events), then ONE window shuffle on
# user_id derives each row's cohort day — no join back to a first-event
# table, so the corpus is scanned once. The (cohort x 14) result table
# is persisted and self-joined for cohort sizes: constant-size work.
# --------------------------------------------------------------------------
@register(
    "q144_cohort_retention",
    oracle="""
    WITH pd AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE event_type = 'purchase'
    ),
    fc AS (SELECT user_id, MIN(day) AS cohort_day FROM pd GROUP BY user_id),
    act AS (
      SELECT fc.cohort_day,
             date_diff('day', fc.cohort_day, pd.day) AS day_offset,
             COUNT(DISTINCT pd.user_id) AS active_users
      FROM pd JOIN fc USING (user_id)
      WHERE date_diff('day', fc.cohort_day, pd.day) <= 13
      GROUP BY 1, 2
    ),
    sz AS (SELECT cohort_day, active_users AS cohort_users
           FROM act WHERE day_offset = 0)
    SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(a.day_offset AS BIGINT) AS day_offset,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           CAST(a.active_users AS BIGINT) AS active_users,
           ROUND(CAST(a.active_users AS DOUBLE) / s.cohort_users, 6)
             AS retention
    FROM act a JOIN sz s USING (cohort_day)
    ORDER BY cohort_day, day_offset
    """,
    doc="first-purchase-day cohort retention matrix, day offsets 0-13 "
    "(single-scan window-derived cohorts)",
)
def q144_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    pd_ = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id")
    act = (
        pd_.withColumn("cohort_day", F.min("day").over(w))
        .withColumn("day_offset", F.datediff("day", "cohort_day").cast("long"))
        .filter(F.col("day_offset") <= 13)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("active_users"))  # rows unique per (user, day)
        .persist()  # two consumers: the matrix and the offset-0 sizes
    )
    sz = act.filter(F.col("day_offset") == 0).select(
        "cohort_day", F.col("active_users").alias("cohort_users")
    )
    return (
        act.join(F.broadcast(sz), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            F.col("cohort_users").cast("long").alias("cohort_users"),
            F.col("active_users").cast("long").alias("active_users"),
            F.round(F.col("active_users") / F.col("cohort_users"), 6).alias("retention"),
        )
        .orderBy("cohort_day", "day_offset")
    )


# --------------------------------------------------------------------------
# q147 — EXACT distinct rollup via mergeable bitmaps (the exact twin of
# q59's HLL rollup): level 1 builds one <= 4 KiB bitmap per (event_type,
# day, 32768-id bucket); level 2 answers BOTH reports off those partials
# alone — the busiest-day profile (per-day bit counts) and the global
# exact distinct (OR-merge each bucket across days, count, sum) — so
# the raw table is scanned exactly once and the partials are persisted
# for the two consumers. Unlike q59 no error-bound boolean is needed:
# the bitmap count IS the exact answer, which the oracle checks
# directly. The 100 TB posture is the same pre-aggregation contract as
# a hypertable's distinct-count cube, but lossless while the id domain
# stays dense (surrogate keys); HLL (q59) remains the sparse-domain
# fallback.
# --------------------------------------------------------------------------
@register(
    "q147_bitmap_distinct_rollup",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(DISTINCT user_id) AS daily_nd
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT d.event_type,
           CAST(g.nd_users AS BIGINT) AS nd_users,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(d.daily_nd) AS BIGINT) AS max_daily_nd
    FROM daily d
    JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS nd_users
          FROM events WHERE ts IS NOT NULL GROUP BY 1) g
      USING (event_type)
    GROUP BY 1, 2
    ORDER BY 1
    """,
    doc="mergeable-bitmap EXACT distinct rollup: per-(type, day, bucket) "
    "bitmaps -> OR-merge -> exact count (the lossless twin of q59)",
)
def q147_bitmap_distinct_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from reddit_big_data_spark.operators.sketches import (
        bitmap_daily_partials,
        bitmap_distinct_rollup,
    )

    ev = read_table(spark, sf_dir, "events")
    partials = bitmap_daily_partials(ev, "event_type", "user_id").persist()
    # two consumers: the global OR-merge and the per-day profile
    return (
        bitmap_distinct_rollup(partials, "event_type")
        .select(
            "event_type",
            F.col("nd").alias("nd_users"),
            "n_days",
            "max_daily_nd",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q148 — first-order Markov TRANSITION MATRIX over per-user event
# sequences: P(next event type | current event type), the standard
# user-journey model (q143's funnel fixes one path; this reports every
# edge). One user_id exchange feeds the lag window — ordered by
# (ts, event_id) so same-timestamp rows have a deterministic successor —
# then the (from, to) count is map-side combinable and the row
# normalization windows over the |types|^2 matrix, never the corpus.
# --------------------------------------------------------------------------
@register(
    "q148_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS from_type
      FROM events WHERE ts IS NOT NULL
    ),
    m AS (
      SELECT from_type, event_type AS to_type, COUNT(*) AS cnt
      FROM seq WHERE from_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
           ROUND(CAST(cnt AS DOUBLE)
                 / SUM(cnt) OVER (PARTITION BY from_type), 6) AS prob
    FROM m
    ORDER BY from_type, to_type
    """,
    doc="first-order Markov transition matrix of per-user event sequences "
    "(lag window -> (from, to) counts -> row-normalized probabilities)",
)
def q148_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    matrix = (
        ev.withColumn("from_type", F.lag("event_type").over(seq))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("cnt"))
    )
    # row-normalize over the tiny (|types| x |types|) matrix
    row = Window.partitionBy("from_type")
    return matrix.select(
        "from_type",
        "to_type",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(row), 6).alias("prob"),
    ).orderBy("from_type", "to_type")


# --------------------------------------------------------------------------
# q149 — POPULATION STABILITY INDEX drift monitor: the standard
# production-ML check that a feature's distribution has not shifted
# between a baseline window and the current one (PSI < 0.1 stable,
# 0.1-0.25 moderate, > 0.25 action). Here: the events value column,
# first half of the date range vs second, 10 fixed-width buckets over
# the GLOBAL [vmin, vmax] (computed once and broadcast — bucket edges
# shared by both periods), add-one smoothing so empty buckets stay
# finite. Completes the monitoring family (q124 novelty, q125 label
# noise) with the distribution-shift axis.
#
# Float discipline (q141's recipe): bucket ids come from ONE double
# expression evaluated identically on both engines (floor of an exact
# min/max-scaled value — no folded sums feed it); the 10 PSI terms per
# type fold in canonical bucket order before the 6dp round.
#
# Scale shape: one corpus scan for the scalar envelope (4 exact
# aggregates), one for the (type, period, bucket) counts — everything
# after is arithmetic over the |types| x 20-cell grid.
# --------------------------------------------------------------------------
@register(
    "q149_psi_drift",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    scal AS (
      SELECT MIN(day) AS dmin, MAX(day) AS dmax,
             MIN(value) AS vmin, MAX(value) AS vmax
      FROM ev
    ),
    tagged AS (
      SELECT e.event_type,
             CASE WHEN (e.day - DATE '1970-01-01')
                       <= FLOOR(((s.dmin - DATE '1970-01-01')
                                 + (s.dmax - DATE '1970-01-01')) / 2.0)
                  THEN 'base' ELSE 'cur' END AS period,
             COALESCE(LEAST(GREATEST(CAST(FLOOR((e.value - s.vmin) * 10.0
                    / NULLIF(s.vmax - s.vmin, 0)) AS INT), 0), 9), 0)
               AS bucket
      FROM ev e, scal s
    ),
    cells AS (
      SELECT event_type, bucket,
             COUNT(CASE WHEN period = 'base' THEN 1 END) AS cb,
             COUNT(CASE WHEN period = 'cur' THEN 1 END) AS cc
      FROM tagged GROUP BY 1, 2
    ),
    totals AS (
      SELECT event_type,
             CAST(SUM(cb) AS BIGINT) AS n_base,
             CAST(SUM(cc) AS BIGINT) AS n_cur
      FROM cells GROUP BY 1
    ),
    grid AS (
      SELECT t.event_type, g.bucket, t.n_base, t.n_cur,
             COALESCE(c.cb, 0) AS cb, COALESCE(c.cc, 0) AS cc
      FROM totals t
      CROSS JOIN (SELECT UNNEST(RANGE(10)) AS bucket) g
      LEFT JOIN cells c
        ON c.event_type = t.event_type AND c.bucket = g.bucket
    ),
    terms AS (
      SELECT event_type, bucket, n_base, n_cur,
             ((cc + 1.0) / (n_cur + 10.0) - (cb + 1.0) / (n_base + 10.0))
             * LN(((cc + 1.0) / (n_cur + 10.0))
                  / ((cb + 1.0) / (n_base + 10.0))) AS term
      FROM grid
    )
    SELECT event_type, n_base, n_cur,
           ROUND(LIST_SUM(LIST(term ORDER BY bucket)), 6) AS psi
    FROM terms
    GROUP BY event_type, n_base, n_cur
    ORDER BY event_type
    """,
    doc="population-stability-index drift of the value distribution, "
    "first vs second half of the date range, per event type",
)
def q149_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select("event_type", F.to_date("ts").alias("day"), "value")
    )
    scal = ev.agg(
        F.min("day").alias("dmin"),
        F.max("day").alias("dmax"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    mid = F.floor(
        (F.unix_date(F.col("dmin")) + F.unix_date(F.col("dmax"))) / 2.0
    )
    bucket = F.coalesce(
        F.least(
            F.greatest(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    * 10.0
                    / F.nullif(F.col("vmax") - F.col("vmin"), F.lit(0.0))
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(9),
        ),
        F.lit(0),
    )
    tagged = ev.crossJoin(F.broadcast(scal)).select(
        "event_type",
        F.when(F.unix_date(F.col("day")) <= mid, "base")
        .otherwise("cur")
        .alias("period"),
        bucket.alias("bucket"),
    )
    cells = (
        tagged.groupBy("event_type", "bucket")
        .agg(
            F.count(F.when(F.col("period") == "base", True)).alias("cb"),
            F.count(F.when(F.col("period") == "cur", True)).alias("cc"),
        )
        .persist()  # two consumers: the per-type totals and the grid join
    )
    totals = cells.groupBy("event_type").agg(
        F.sum("cb").alias("n_base"), F.sum("cc").alias("n_cur")
    )
    grid = (
        totals.select(
            "event_type",
            "n_base",
            "n_cur",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bucket"),
        )
        .join(cells, ["event_type", "bucket"], "left")
        .fillna(0, subset=["cb", "cc"])
    )
    pb = (F.col("cb") + 1.0) / (F.col("n_base") + 10.0)
    pc = (F.col("cc") + 1.0) / (F.col("n_cur") + 10.0)
    terms = grid.select(
        "event_type",
        "bucket",
        "n_base",
        "n_cur",
        ((pc - pb) * F.log(pc / pb)).alias("term"),
    )
    fold = F.aggregate(
        F.sort_array(F.collect_list(F.struct("bucket", "term"))),
        F.lit(0.0),
        lambda a, s: a + s["term"],
    )
    return (
        terms.groupBy("event_type", "n_base", "n_cur")
        .agg(F.round(fold, 6).alias("psi"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q158 — RFM SEGMENTATION (recency / frequency / monetary), the classic
# marketing-analytics cut: per purchasing user, score each of the three
# dimensions into quintiles (5 = most recent / most frequent / highest
# spend) and report the segment grid with user counts and exact spend.
# Scores come from the library's scale-safe global NTILE
# (operators/ranking.py — two-phase rank, no single-partition window;
# the NTILE == ntile_from_rank equivalence is already oracle-pinned by
# q18), each over a TOTAL order tie-broken by user_id so quintile
# boundaries are deterministic. Monetary stays integer cents — the
# segment totals are exact BIGINTs, no float discipline anywhere.
# Scale shape: one corpus scan to the per-user aggregate; three
# rank passes over |purchasing users| rows; a <= 125-cell output grid.
# --------------------------------------------------------------------------
@register(
    "q158_rfm_segmentation",
    oracle="""
    WITH pu AS (
      SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day,
             COUNT(*) AS freq,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS monetary
      FROM events
      WHERE event_type = 'purchase'
        AND ts IS NOT NULL AND value IS NOT NULL
      GROUP BY 1
    ),
    scored AS (
      SELECT CAST(NTILE(5) OVER (ORDER BY last_day, user_id) AS INT)
               AS r_score,
             CAST(NTILE(5) OVER (ORDER BY freq, user_id) AS INT)
               AS f_score,
             CAST(NTILE(5) OVER (ORDER BY monetary, user_id) AS INT)
               AS m_score,
             monetary
      FROM pu
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS users,
           CAST(SUM(monetary) AS BIGINT) AS total_cents
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc="RFM quintile segmentation of purchasing users (scale-safe "
    "global NTILE x3, exact-cents monetary)",
)
def q158_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.ranking import with_global_ntile

    cents = F.round(F.col("value") * 100).cast("long")
    per_user = (
        read_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count("*").alias("freq"),
            F.sum(cents).alias("monetary"),
        )
    )
    scored = with_global_ntile(
        per_user, ["last_day", "user_id"], 5, "r_score"
    )
    scored = with_global_ntile(scored, ["freq", "user_id"], 5, "f_score")
    scored = with_global_ntile(
        scored, ["monetary", "user_id"], 5, "m_score"
    )
    return (
        scored.groupBy(
            F.col("r_score").cast("int").alias("r_score"),
            F.col("f_score").cast("int").alias("f_score"),
            F.col("m_score").cast("int").alias("m_score"),
        )
        .agg(
            F.count("*").alias("users"),
            F.sum("monetary").alias("total_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# --------------------------------------------------------------------------
# q162 — KAPLAN-MEIER survival curve of customer lifetime (round 10): the
# standard right-censored survival estimator every retention analysis
# ends with, over the orders table. A customer's lifetime = days between
# first and last order; the customer is a DEATH (churned) if their last
# order is >= 365 days before the corpus horizon, CENSORED otherwise
# (still alive at observation end — exactly what KM exists to handle;
# naively averaging durations would bias survival DOWN). At each death
# duration t: S(t) = prod_{t_i <= t} (1 - d_i / n_i), with n_i = everyone
# whose observed duration >= t_i (a SUFFIX sum — no total-count scalar
# needed).
#
# Float discipline: each factor (1 - d/n) is an exactly-rounded binary64
# division of two int64s, and the cumulative product is a LEFT FOLD in
# duration order on BOTH engines — Spark folds the window-ordered
# collect_list with F.aggregate, the oracle folds list prefixes with
# list_reduce (deliberately NOT DuckDB's windowed product(), whose
# segment-tree combination order is not guaranteed to be the left fold —
# FP multiplication is not associative). Bit-equal products, one final
# round(6).
#
# Scale shape: the per-customer reduce shuffles once on custkey; the two
# global windows (suffix at-risk sum, cumulative product) run on the
# per-DURATION aggregate — bounded by the calendar span in days at ANY
# corpus scale, the q08 pre-aggregated-tiny-window pattern.
# --------------------------------------------------------------------------
_KM_CHURN_DAYS = 365


@register(
    "q162_kaplan_meier",
    oracle=f"""
    WITH pu AS (
      SELECT o_custkey,
             MIN(CAST(o_orderdate AS DATE)) AS fd,
             MAX(CAST(o_orderdate AS DATE)) AS ld
      FROM orders GROUP BY 1
    ),
    b AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS hd FROM orders),
    lab AS (
      SELECT date_diff('day', fd, ld) AS dur,
             CASE WHEN date_diff('day', ld, hd) >= {_KM_CHURN_DAYS}
                  THEN 1 ELSE 0 END AS death
      FROM pu, b
    ),
    agg AS (
      SELECT dur,
             CAST(SUM(death) AS BIGINT) AS d,
             CAST(SUM(1 - death) AS BIGINT) AS c
      FROM lab GROUP BY dur
    ),
    risk AS (
      SELECT dur, d, c,
             CAST(SUM(d + c) OVER (ORDER BY dur
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS BIGINT) AS n
      FROM agg
    ),
    dd AS (SELECT * FROM risk WHERE d > 0),
    packed AS (
      SELECT list(dur ORDER BY dur) AS durs,
             list(n ORDER BY dur) AS ns,
             list(d ORDER BY dur) AS ds,
             list(c ORDER BY dur) AS cs,
             list(1.0 - CAST(d AS DOUBLE) / n ORDER BY dur) AS fs
      FROM dd
    )
    SELECT CAST(unnest(durs) AS BIGINT) AS duration_days,
           unnest(ns) AS at_risk,
           unnest(ds) AS deaths,
           unnest(cs) AS censored_here,
           ROUND(unnest([list_reduce(fs[1:i], (a, x) -> a * x)
                         for i in generate_series(1, len(fs))]), 6)
             AS survival
    FROM packed
    ORDER BY duration_days
    """,
    doc="Kaplan-Meier survival of customer lifetime (right-censored at "
    "the corpus horizon; left-fold cumulative product, bit-equal "
    "factors)",
)
def q162_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.attach import (
        attach_constant_row,
        with_constant_key,
    )

    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("day")
    )
    pu = orders.groupBy("o_custkey").agg(
        F.min("day").alias("fd"), F.max("day").alias("ld")
    )
    horizon = orders.agg(F.max("day").alias("hd"))
    lab = attach_constant_row(pu, with_constant_key(horizon), "o_custkey")
    lifetimes = lab.select(
        F.datediff("ld", "fd").cast("long").alias("dur"),
        F.when(
            F.datediff("hd", "ld") >= _KM_CHURN_DAYS, 1
        ).otherwise(0).alias("death"),
    )
    return km_curve(lifetimes)


def km_curve(lifetimes: DataFrame) -> DataFrame:
    """Kaplan-Meier estimator over (dur: long, death: 0/1) observations
    — the estimator math, factored so the property suite can drive it
    with arbitrary censoring patterns (tests/test_properties.py) and
    any lifetime-producing query can reuse it. See the q162 header for
    the float-fold discipline."""
    from pyspark.sql import Window

    agg = lifetimes.groupBy("dur").agg(
        F.sum("death").alias("d"),
        F.sum(F.lit(1) - F.col("death")).alias("c"),
    )
    w_suffix = Window.orderBy("dur").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    risk = agg.withColumn("n", F.sum(F.col("d") + F.col("c")).over(w_suffix))
    dd = risk.filter(F.col("d") > 0)
    factor = F.lit(1.0) - F.col("d").cast("double") / F.col("n")
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = dd.withColumn(
        "s",
        F.aggregate(
            F.collect_list(factor).over(w_cum),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ),
    )
    return km.select(
        F.col("dur").alias("duration_days"),
        F.col("n").alias("at_risk"),
        F.col("d").alias("deaths"),
        F.col("c").alias("censored_here"),
        F.round("s", 6).alias("survival"),
    ).orderBy("duration_days")
