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
    -- tie-free emissions (r12, the q22/q73 lesson): the interpolated
    -- p05/p95 of 2dp prices terminate at 4dp, so ROUND at 4 discards
    -- nothing; mean_raw derives UNROUNDED from the on-grid 2dp sum;
    -- mean_winsorized goes through exact 4dp integer units per row
    -- (clamped values terminate at 4dp, and the unit conversion absorbs
    -- the engines' ulp disagreement on the clamp bounds).
    SELECT l.l_returnflag, COUNT(*) AS n,
           ROUND(ANY_VALUE(b.p05), 4) AS p05,
           ROUND(ANY_VALUE(b.p95), 4) AS p95,
           ROUND(SUM(l_extendedprice), 2) / COUNT(*) AS mean_raw,
           SUM(CAST(FLOOR(LEAST(GREATEST(l_extendedprice, b.p05), b.p95)
                          * 10000 + 0.5) AS BIGINT)) / 10000.0 / COUNT(*)
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
    from reddit_big_data_spark.operators.exact import exact_avg

    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            # 4dp: the no-discard scale for interpolated quantiles of
            # 2dp prices; means per the oracle comment
            F.round(F.first("p05"), 4).alias("p05"),
            F.round(F.first("p95"), 4).alias("p95"),
            (F.round(F.sum("l_extendedprice"), 2) / F.count("*")).alias(
                "mean_raw"
            ),
            exact_avg(clamped, 4).alias("mean_winsorized"),
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
           -- no-discard rounding scales (r12 sf0.001 sweep; the q22
           -- principle): the interpolated median of 2dp prices
           -- terminates at 3dp, the MAD — a midpoint of two 3dp
           -- absolute deviations — at 4dp. Rounding AT the terminating
           -- scale discards nothing, so both engines produce the same
           -- canonical double; rounding one digit shy (2dp) hit an
           -- exact .xx5 tie at sf0.001, where Spark (shortest-repr
           -- HALF_UP) and DuckDB (binary) disagree.
           ROUND(ANY_VALUE(m.med), 3) AS med,
           ROUND(ANY_VALUE(m.mad), 4) AS mad,
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
            # 3dp/4dp: no-discard scales for these stats (oracle comment)
            F.round(F.first("med"), 3).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.sum(
                (
                    F.abs(F.col("l_extendedprice") - F.col("med"))
                    > 1.4826 * F.col("mad")
                ).cast("long")
            ).alias("n_beyond_1s"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q154 — BENFORD first-digit audit: the classic forensic data-quality
# test (fabricated or unit-mangled numeric columns rarely follow the
# log-uniform first-digit law). Per event type: chi-square distance of
# the value column's first-significant-digit distribution from Benford
# p_d = log10(1 + 1/d). The registry's first hypothesis-test family.
#
# Determinism: the first digit is taken from the INTEGER cents string
# (one identical round-to-cents expression per row, then int->varchar,
# which has no cross-engine formatting ambiguity — float log10/pow
# first-digit extraction is the classic boundary pitfall at exact
# powers of ten). The 9 chi-square terms per type fold in canonical
# digit order (q141's discipline); zero-count digits still contribute
# their expected mass via the dense 1..9 grid.
#
# Scale shape: one corpus scan into a (type, digit) count table
# (<= 9 x |types| rows); everything after is arithmetic on that grid.
# --------------------------------------------------------------------------
@register(
    "q154_benford_audit",
    oracle="""
    WITH cents AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
      WHERE value IS NOT NULL AND CAST(ROUND(value * 100) AS BIGINT) >= 1
    ),
    counts AS (
      SELECT event_type,
             CAST(SUBSTR(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit,
             COUNT(*) AS o
      FROM cents GROUP BY 1, 2
    ),
    totals AS (
      SELECT event_type, CAST(SUM(o) AS BIGINT) AS n
      FROM counts GROUP BY 1
    ),
    grid AS (
      SELECT t.event_type, g.digit, t.n, COALESCE(c.o, 0) AS o
      FROM totals t
      CROSS JOIN (SELECT UNNEST(RANGE(1, 10)) AS digit) g
      LEFT JOIN counts c
        ON c.event_type = t.event_type AND c.digit = g.digit
    ),
    terms AS (
      SELECT event_type, digit, n,
             (o - n * (LN(1 + 1.0 / digit) / LN(10)))
             * (o - n * (LN(1 + 1.0 / digit) / LN(10)))
             / (n * (LN(1 + 1.0 / digit) / LN(10))) AS term
      FROM grid
    )
    SELECT event_type, n,
           ROUND(LIST_SUM(LIST(term ORDER BY digit)), 6) AS chi2
    FROM terms
    GROUP BY event_type, n
    ORDER BY event_type
    """,
    doc="Benford first-digit chi-square audit of the value column per "
    "event type (forensic data-quality screen)",
)
def q154_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("value") * 100).cast("long")
    counts = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull() & (cents >= 1))
        .groupBy(
            "event_type",
            F.substring(cents.cast("string"), 1, 1)
            .cast("int")
            .alias("digit"),
        )
        .agg(F.count("*").alias("o"))
        .persist()  # two consumers: per-type totals and the grid join
    )
    totals = counts.groupBy("event_type").agg(F.sum("o").alias("n"))
    grid = (
        totals.select(
            "event_type",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit"),
        )
        .join(counts, ["event_type", "digit"], "left")
        .fillna(0, subset=["o"])
    )
    p = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    e = F.col("n") * p
    terms = grid.select(
        "event_type",
        "digit",
        "n",
        ((F.col("o") - e) * (F.col("o") - e) / e).alias("term"),
    )
    fold = F.aggregate(
        F.sort_array(F.collect_list(F.struct("digit", "term"))),
        F.lit(0.0),
        lambda a, s: a + s["term"],
    )
    return (
        terms.groupBy("event_type", "n")
        .agg(F.round(fold, 6).alias("chi2"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q155 — CHI-SQUARE INDEPENDENCE test: is event type independent of the
# day of week? The standard categorical-association test over the
# contingency table. Uses the algebraic identity
# chi2 = N * (sum over OBSERVED cells o^2 / (row_i * col_j)) - N,
# which needs no dense grid (an empty cell contributes nothing to the
# sum and its expected mass lives in the -N term) — the margins come
# from three windows over the <= |types| x 7 count table, never the
# corpus. Terms fold in canonical (type, dow) order before the 6dp
# round; dof = (R-1)(C-1) attaches as a one-row broadcast scalar.
# --------------------------------------------------------------------------
@register(
    "q155_chi2_independence",
    oracle="""
    WITH c AS (
      SELECT event_type AS t, dayofweek(ts) + 1 AS dow, COUNT(*) AS o
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    m AS (
      SELECT t, dow, o,
             SUM(o) OVER (PARTITION BY t) AS r,
             SUM(o) OVER (PARTITION BY dow) AS cc,
             SUM(o) OVER () AS n
      FROM c
    ),
    terms AS (
      SELECT t, dow, n,
             CAST(o AS DOUBLE) * o / (r * cc) AS term
      FROM m
    ),
    dof AS (
      SELECT CAST((COUNT(DISTINCT t) - 1) * (COUNT(DISTINCT dow) - 1)
                  AS BIGINT) AS dof
      FROM c
    )
    SELECT CAST(s.n AS BIGINT) AS n, d.dof,
           ROUND(s.n * s.acc - s.n, 6) AS chi2
    FROM (
      SELECT n, LIST_SUM(LIST(term ORDER BY t, dow)) AS acc
      FROM terms GROUP BY n
    ) s CROSS JOIN dof d
    """,
    doc="chi-square independence test of event type vs day-of-week "
    "(contingency margins via windows over the tiny count table)",
)
def q155_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            F.col("event_type").alias("t"),
            F.dayofweek("ts").alias("dow"),
        )
        .agg(F.count("*").alias("o"))
        .persist()  # two consumers: the margin windows and the dof scalar
    )
    m = c.select(
        "t",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("t")).alias("r"),
        F.sum("o").over(Window.partitionBy("dow")).alias("cc"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    terms = m.select(
        "t",
        "dow",
        "n",
        (
            F.col("o").cast("double")
            * F.col("o")
            / (F.col("r") * F.col("cc"))
        ).alias("term"),
    )
    fold = F.aggregate(
        F.sort_array(F.collect_list(F.struct("t", "dow", "term"))),
        F.lit(0.0),
        lambda a, s: a + s["term"],
    )
    summed = terms.groupBy("n").agg(fold.alias("acc"))
    dof = c.agg(
        (
            (F.countDistinct("t") - 1) * (F.countDistinct("dow") - 1)
        ).alias("dof")
    )
    return summed.crossJoin(F.broadcast(dof)).select(
        F.col("n"),
        F.col("dof"),
        F.round(F.col("n") * F.col("acc") - F.col("n"), 6).alias("chi2"),
    )


# --------------------------------------------------------------------------
# q156 — two-sample KOLMOGOROV-SMIRNOV test: D = sup |F_click - F_purchase|
# over the value column — the distribution-comparison member of the
# hypothesis-test family (q154 goodness-of-fit, q155 independence).
# Both ECDFs are step functions jumping only at pooled sample points,
# so the supremum is attained at a distinct pooled value: D is an exact
# max over the distinct-value grid, no approximation.
#
# The scalable part is the CUMULATIVE count: a naive
# `SUM() OVER (ORDER BY value)` is a single-partition window. Instead
# the distinct-value table gets a total-order bucket id from
# with_global_ntile (the library's scale-safe ranking), each bucket
# cumsums INTERNALLY (window partitioned by bucket), and the 64
# bucket totals prefix-sum on a constant-size table — the classic
# two-phase parallel prefix sum. Per-point work after that is two
# exact-integer divisions and a subtraction (identical on both
# engines), and MAX is fold-order-free — no float discipline needed.
# --------------------------------------------------------------------------
@register(
    "q156_ks_two_sample",
    oracle="""
    WITH pooled AS (
      SELECT value,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
      FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ),
    g AS (
      SELECT value, SUM(a) AS ca, SUM(b) AS cb
      FROM pooled GROUP BY value
    ),
    c AS (
      SELECT SUM(ca) OVER (ORDER BY value) AS cum_a,
             SUM(cb) OVER (ORDER BY value) AS cum_b
      FROM g
    ),
    n AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
      FROM g
    )
    SELECT n.n_a, n.n_b,
           ROUND(MAX(ABS(CAST(cum_a AS DOUBLE) / n.n_a
                         - CAST(cum_b AS DOUBLE) / n.n_b)), 6) AS ks_d
    FROM c CROSS JOIN n
    GROUP BY n.n_a, n.n_b
    """,
    doc="exact two-sample Kolmogorov-Smirnov D between click and "
    "purchase value distributions (two-phase parallel prefix sum)",
)
def q156_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from reddit_big_data_spark.operators.ranking import with_global_ntile

    pooled = (
        read_table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("click", "purchase")
            & F.col("value").isNotNull()
        )
        .select(
            "value",
            (F.col("event_type") == "click").cast("long").alias("a"),
            (F.col("event_type") == "purchase").cast("long").alias("b"),
        )
    )
    g = (
        pooled.groupBy("value")
        .agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
        .persist()  # two consumers: the bucketed cumsum and the n scalars
    )
    bucketed = with_global_ntile(g, ["value"], 64, "bucket").persist()
    # phase 1: cumulative counts INSIDE each value-ordered bucket
    win = (
        Window.partitionBy("bucket")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.select(
        "bucket",
        "value",
        F.sum("ca").over(win).alias("la"),
        F.sum("cb").over(win).alias("lb"),
    )
    # phase 2: per-bucket totals prefix-sum on the 64-row table
    off_win = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
        .select(
            "bucket",
            F.coalesce(F.sum("ta").over(off_win), F.lit(0)).alias("oa"),
            F.coalesce(F.sum("tb").over(off_win), F.lit(0)).alias("ob"),
        )
    )
    n = g.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    ecdf = (
        local.join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(n))
        .select(
            "n_a",
            "n_b",
            F.abs(
                (F.col("oa") + F.col("la")).cast("double") / F.col("n_a")
                - (F.col("ob") + F.col("lb")).cast("double") / F.col("n_b")
            ).alias("dev"),
        )
    )
    return ecdf.groupBy("n_a", "n_b").agg(
        F.round(F.max("dev"), 6).alias("ks_d")
    )
