"""Relational core queries: projection/filter (P*), joins (J*),
aggregations (A*), sorts/limits (O*), set ops (§2.7).

Each query re-expresses a reference pattern over the driver testdata
(FIXTURES.md §5 mapping) and carries a DuckDB oracle. Float aggregates are
rounded identically on both sides; every computed column is aliased
identically on both sides (driver hash-compares by sorted column name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table, sorted_report


# --------------------------------------------------------------------------
# q01 — the reference's very first analysis: filtered group-count, sorted
# desc, top-N (code/project_starter_script.py:80: posts-per-subreddit).
# Exercises P1 P3 P4 P5 A1 A6 O1 O2 F8.
# --------------------------------------------------------------------------
@register(
    "q01_top_groups_by_count",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS cnt
    FROM lineitem
    WHERE l_quantity >= 25 AND l_linestatus <> 'F'
    GROUP BY l_returnflag
    ORDER BY cnt DESC, l_returnflag
    LIMIT 10
    """,
    doc="filter -> groupBy.count -> orderBy desc -> limit (A1+O1+O2)",
)
def q01_top_groups_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter((F.col("l_quantity") >= 25) & (F.col("l_linestatus") != "F"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("l_returnflag"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q04 — missing-data report (P11/P12/F16/F17,
# code/eda/project_eda.py:657-674): per-probe counts of NULL / NaN / empty /
# sentinel values, one output row.
# --------------------------------------------------------------------------
@register(
    "q04_missing_report",
    oracle="""
    SELECT
      COUNT(CASE WHEN text IS NULL OR text = '' THEN 1 END)      AS text_missing,
      COUNT(CASE WHEN text LIKE '%None%' THEN 1 END)             AS text_none_marker,
      COUNT(CASE WHEN lang IS NULL THEN 1 END)                   AS lang_null,
      COUNT(CASE WHEN n_chars IS NULL THEN 1 END)                AS n_chars_null,
      COUNT(*)                                                   AS total_rows
    FROM documents
    """,
    doc="missing-data probe: NULL/empty/sentinel counts (P11)",
)
def q04_missing_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    c = F.col
    return docs.agg(
        F.count(F.when(c("text").isNull() | (c("text") == ""), True)).alias("text_missing"),
        F.count(F.when(c("text").contains("None"), True)).alias("text_none_marker"),
        F.count(F.when(c("lang").isNull(), True)).alias("lang_null"),
        F.count(F.when(c("n_chars").isNull(), True)).alias("n_chars_null"),
        F.count("*").alias("total_rows"),
    )


# --------------------------------------------------------------------------
# q05 — the reference's join spine (J1/J2/J5, code/nlp/Data_Gathering.py:
# 141,165,214): small-dim broadcast joins into a big fact, with a
# synthesized join key (concat(lit, id)). Revenue per nation within one
# region. Dimensions are broadcast explicitly — the reference's "absurdly
# long" join (Data_Gathering.py:223) is exactly the shuffle this avoids.
# --------------------------------------------------------------------------
@register(
    "q05_broadcast_join_chain",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS order_cnt,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON ('c_' || CAST(c.c_custkey AS VARCHAR)) = ('c_' || CAST(o.o_custkey AS VARCHAR))
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('AMERICA', 'ASIA')
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="broadcast dim joins + synthesized join key (J1+J2+J5+F12)",
)
def q05_broadcast_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "join_key", F.concat(F.lit("c_"), F.col("o_custkey").cast("string"))
    )
    customer = read_table(spark, sf_dir, "customer").withColumn(
        "join_key", F.concat(F.lit("c_"), F.col("c_custkey").cast("string"))
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    dim = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name").isin("AMERICA", "ASIA"))
        .select("join_key", "n_name")
    )
    # nation/region are genuinely tiny -> explicit broadcast above. `dim`
    # is a fact-fraction (~40% of customers), so the join strategy is left
    # to AQE: at 100 TB a forced broadcast here would push millions of rows
    # to every executor (and OOM the driver).
    return (
        orders.join(dim, "join_key")
        .groupBy("n_name")
        .agg(
            F.count("*").alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --------------------------------------------------------------------------
# q06 — multi-aggregate group-by (A2-A5, e.g. code/nlp/Sentiment_Analysis.py:
# 250-254 multi-avg; code/nlp/Data_Gathering.py:255 sum). TPC-H Q1 shape:
# two grouping keys, count/sum/avg mix, date predicate pushed to the scan.
# --------------------------------------------------------------------------
@register(
    "q06_groupby_multi_agg",
    oracle="""
    -- revenue/avg terms via exact integer units (r12, operators/exact.py):
    -- the 4dp-terminating discount product rounded at 2dp was a ~1%-per-
    -- group cross-engine tie lottery on every testdata regeneration, and
    -- AVG over a 2,5-smooth group count terminates just past 4dp. sum_qty
    -- stays ROUNDed: integer quantities sum exactly in doubles, so both
    -- engines round the identical value.
    SELECT l_returnflag, l_linestatus,
           COUNT(*)                                              AS cnt,
           ROUND(SUM(l_quantity), 2)                             AS sum_qty,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                    AS BIGINT)) / 10000.0                        AS sum_disc_price,
           SUM(CAST(FLOOR(l_quantity * 1 + 0.5) AS BIGINT)) / 1.0
             / COUNT(l_quantity)                                 AS avg_qty,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0
             / COUNT(l_extendedprice)                            AS avg_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="2-key groupBy with count/sum/avg mix (A2+A3+A4+A5, TPC-H Q1 shape)",
)
def q06_groupby_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.exact import exact_avg, exact_sum

    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            exact_sum(disc_price, 4).alias("sum_disc_price"),
            exact_avg(F.col("l_quantity"), 0).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice"), 2).alias("avg_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q07 — scalar Pearson correlation + derived percentage (A7/F22,
# code/eda/project_eda.py:229-230,266-267). One-row result.
# --------------------------------------------------------------------------
@register(
    "q07_correlations",
    oracle="""
    SELECT
      ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      ROUND(CORR(l_extendedprice, l_discount), 6) AS corr_price_disc,
      ROUND(100.0 * COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) / COUNT(*), 4)
        AS pct_discounted
    FROM lineitem
    """,
    doc="stat.corr + percentage arithmetic (A7+F22)",
)
def q07_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("corr_price_disc"),
        F.round(
            100.0 * F.count(F.when(F.col("l_discount") > 0.05, True)) / F.count("*"), 4
        ).alias("pct_discounted"),
    )


# --------------------------------------------------------------------------
# q12 — global sort + limit (O2, code/eda/project_eda.py:170: top-10 posts
# by score). Spark plans TakeOrderedAndProject — no full sort at scale.
# --------------------------------------------------------------------------
@register(
    "q12_top_n_rows",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total
    FROM orders
    ORDER BY total DESC, o_orderkey
    LIMIT 10
    """,
    doc="orderBy desc + limit => TakeOrderedAndProject (O2)",
)
def q12_top_n_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total")
        )
        .orderBy(F.col("total").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q13 — set operations (§2.7: absent in the reference, the 34-subreddit scan
# used isin instead; built-in in Spark). (BUILDING ∪ MACHINERY) ∖ nation-13,
# ∩ with high-balance customers.
# --------------------------------------------------------------------------
@register(
    "q13_set_ops",
    oracle="""
    WITH ab AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    ),
    excl AS (SELECT c_custkey FROM customer WHERE c_nationkey = 13),
    rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
    SELECT c_custkey FROM (
      SELECT c_custkey FROM ab
      EXCEPT
      SELECT c_custkey FROM excl
    )
    INTERSECT
    SELECT c_custkey FROM rich
    ORDER BY c_custkey
    """,
    doc="union / except / intersect (§2.7 extension)",
)
def q13_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    excl = cust.filter(F.col("c_nationkey") == 13).select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 0).select("c_custkey")
    # Spark union == UNION ALL; distinct() gives SQL UNION semantics.
    # subtract/intersect are distinct-semantics like SQL EXCEPT/INTERSECT.
    return (
        a.union(b).distinct().subtract(excl).intersect(rich).orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# q14 — semi/anti joins (absent in the reference: it emulates anti-join with
# 8 chained != at code/nlp/Data_Gathering.py:77-84 — P16). Customers with no
# orders (anti) and suppliers in nations that have customers (semi).
# --------------------------------------------------------------------------
@register(
    "q14_semi_anti_join",
    oracle="""
    SELECT 'no_orders' AS tag, COUNT(*) AS cnt
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'supp_with_cust_nation' AS tag, COUNT(*) AS cnt
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = s.s_nationkey)
    """,
    doc="left_anti + left_semi joins (P16 done right)",
)
def q14_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    no_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("no_orders").alias("tag"), "cnt")
    )
    semi = (
        supp.join(cust, supp.s_nationkey == cust.c_nationkey, "left_semi")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("supp_with_cust_nation").alias("tag"), "cnt")
    )
    return no_orders.union(semi)


# --------------------------------------------------------------------------
# q15 — rollup / grouping-sets (§2.4 "absent" extension). Order counts by
# (status, priority) with subtotals; grouping-id distinguishes levels.
# --------------------------------------------------------------------------
@register(
    "q15_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>')   AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    doc="rollup with subtotal rows (§2.4 extension)",
)
def q15_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "cnt",
            "revenue",
        )
        .orderBy("status", "priority")
    )


# --------------------------------------------------------------------------
# q16 — distinct-count family: exact countDistinct per group plus exact
# percentiles (§2.4 extension; approx_count_distinct/percentile_approx are
# the scale path but are estimator-specific, so the oracle pins the exact
# forms).
# --------------------------------------------------------------------------
@register(
    "q16_distinct_percentiles",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey)  AS nd_parts,
           COUNT(DISTINCT l_suppkey)  AS nd_supps,
           ROUND(MEDIAN(l_extendedprice), 4) AS median_price,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="countDistinct + exact percentiles per group (§2.4 extension)",
)
def q16_distinct_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    # Mixing n countDistincts with exact percentiles in ONE agg makes
    # Catalyst Expand every input row (n+1)x through the percentile
    # buffers; splitting into pre-distinct aggs + a percentile agg joined
    # on the (tiny) group key measured 4x faster at sf0.1 (9.1s -> 2.3s).
    # r17 (guide §2.3/§5, the q22/q97/q88 shape): both quantiles share ONE
    # percentile buffer via the array form — the value multiset is
    # collected and sorted once instead of per quantile.
    pctl = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("__p")
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("__p", 1), 4).alias("median_price"),
            F.round(F.element_at("__p", 2), 4).alias("p90_price"),
        )
    )
    nd_parts = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("nd_parts"))
    )
    nd_supps = (
        li.select("l_returnflag", "l_suppkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("nd_supps"))
    )
    return sorted_report(
        pctl.join(nd_parts, "l_returnflag")
        .join(nd_supps, "l_returnflag")
        .select(
            "l_returnflag", "nd_parts", "nd_supps", "median_price", "p90_price"
        ),
        "l_returnflag",
    )


# --------------------------------------------------------------------------
# q27 — TPC-H Q1 analogue (pricing summary report): the canonical one-pass
# scan-heavy aggregate every warehouse engine is judged on. One full
# lineitem scan with the shipdate filter pushed to parquet, map-side
# partial aggregation into 6 (returnflag, linestatus) groups. Averages are
# emitted as SUM + COUNT (hash-safe per the oracle-gotcha notes: rounded
# AVG can land on an engine-dependent rounding boundary; sums of
# cents-grained values cannot).
# --------------------------------------------------------------------------
@register(
    "q27_pricing_summary",
    oracle="""
    -- disc_price/charge via exact integer units (operators/exact.py):
    -- the products terminate at 4/6 decimals, so ROUND at 2 was a
    -- structural cross-engine tie lottery; qty and base_price sums
    -- terminate at <=2dp and stay ROUNDed (no information discarded).
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                    AS BIGINT)) / 10000.0 AS sum_disc_price,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                          * 1000000 + 0.5) AS BIGINT)) / 1000000.0
             AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shape pricing summary (scan-heavy partial-agg pass)",
)
def q27_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.exact import exact_sum

    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            exact_sum(disc_price, 4).alias("sum_disc_price"),
            exact_sum(disc_price * (1 + F.col("l_tax")), 6).alias(
                "sum_charge"
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q21 — TPC-H Q3 analogue (shipping priority): the canonical 3-way
# fact-dim-fact join + top-N revenue. Filters sit on each scan BEFORE the
# joins (pushed to parquet); the join order is left to Catalyst/AQE — the
# customer side is 1/5th of a dimension after the segment filter, which
# AQE broadcasts at small SF and shuffle-joins at scale (no manual
# broadcast hint: VERDICT r1 flagged force-broadcasting fact-fractions).
# Top-10 orders by EXACT-UNIT revenue (ties broken by orderkey) so ordering
# is identical across engines, via TakeOrdered — no global sort.
# --------------------------------------------------------------------------
@register(
    "q21_shipping_priority",
    oracle="""
    -- revenue via exact integer units (operators/exact.py): per-ORDER
    -- groups are tiny (<=7 lineitems), so ROUND at 2dp of the
    -- 4dp-terminating product was a ~1%-per-group tie that would corrupt
    -- the top-10 SELECTION as well as the value; the exact 4dp revenue
    -- also makes the DESC ranking engine-deterministic.
    SELECT l_orderkey,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                    AS BIGINT)) / 10000.0 AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-shape 3-way join + top-N revenue (AQE-chosen join strategy)",
)
def q21_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.exact import exact_sum

    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        cust.select("c_custkey")
        .join(orders, cust["c_custkey"] == orders["o_custkey"])
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q28 — explicit GROUPING SETS with grouping_id: the mixed-granularity
# aggregation ROLLUP/CUBE can't express ((status, priority), (status),
# (priority)) — one Expand pass, no self-unions — plus grouping_id as the
# level discriminator (robust where a real NULL key would alias with the
# subtotal NULL, which COALESCE-only outputs can't distinguish).
# --------------------------------------------------------------------------
@register(
    "q28_grouping_sets",
    oracle="""
    SELECT CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
           AS BIGINT) AS gid,
           COALESCE(o_orderstatus, '<all>')   AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority))
    ORDER BY gid, status, priority
    """,
    doc="GROUPING SETS + grouping_id mixed-granularity aggregate (§2.4 ext)",
)
def q28_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            "gid",
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "cnt",
            "revenue",
        )
        .orderBy("gid", "status", "priority")
    )


# --------------------------------------------------------------------------
# q159 — PARETO / ABC revenue-concentration analysis: rank customers by
# total order revenue (descending) and classify A = the head covering
# the first 80% of revenue, B = to 95%, C = the tail — the standard
# concentration read-out ("do 20% of customers drive 80% of revenue").
# The cumulative revenue uses q156's two-phase parallel prefix sum
# (scale-safe global ntile buckets the rank order, buckets cumsum
# internally, 64 bucket totals prefix-sum on a constant table) — never
# a single-partition ORDER BY window. Revenue is exact integer cents
# and the class rule compares INTEGERS ((cum_before * 100) vs
# (total * 80)), so the A/B/C boundary is exact on both engines; the
# one float is the final rounded share per class.
# --------------------------------------------------------------------------
@register(
    "q159_pareto_abc",
    oracle="""
    WITH pc AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT rev,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey) AS cum
      FROM pc
    ),
    t AS (SELECT SUM(rev) AS total FROM pc),
    cls AS (
      SELECT rev, t.total,
             CASE WHEN (cum - rev) * 100 < t.total * 80 THEN 'A'
                  WHEN (cum - rev) * 100 < t.total * 95 THEN 'B'
                  ELSE 'C' END AS cls
      FROM c CROSS JOIN t
    )
    SELECT cls, CAST(COUNT(*) AS BIGINT) AS customers,
           CAST(SUM(rev) AS BIGINT) AS class_cents,
           ROUND(CAST(SUM(rev) AS DOUBLE) / total, 6) AS share
    FROM cls
    GROUP BY cls, total
    ORDER BY cls
    """,
    doc="Pareto/ABC revenue concentration: A/B/C customer classes at "
    "80/95% cumulative revenue (exact-cents integer boundaries)",
)
def q159_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from reddit_big_data_spark.operators.ranking import with_global_ntile

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("rev"))
    )
    bucketed = with_global_ntile(
        per_cust, [F.col("rev").desc(), "o_custkey"], 64, "bucket"
    ).persist()  # three consumers: local cumsum, offsets, total scalar
    order = [F.col("rev").desc(), F.col("o_custkey")]
    win = (
        Window.partitionBy("bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = bucketed.select(
        "bucket", "rev", F.sum("rev").over(win).alias("lc")
    )
    off_win = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        bucketed.groupBy("bucket")
        .agg(F.sum("rev").alias("tb"))
        .select(
            "bucket",
            F.coalesce(F.sum("tb").over(off_win), F.lit(0)).alias("off"),
        )
    )
    total = bucketed.agg(F.sum("rev").alias("total"))
    # decimal(38,0) factors: the threshold products (cum_cents*100,
    # total_cents*80) stay int64 at test SFs but overflow SILENTLY at
    # large corpora while DuckDB's BIGINT math promotes to HUGEINT —
    # wrong ABC classes, no error (ADVICE r9). Decimal keeps the
    # comparison exact at any scale; the compared values never reach the
    # output schema, so dtypes are unchanged.
    before = (F.col("off") + F.col("lc") - F.col("rev")).cast(
        "decimal(38,0)"
    )
    total_dec = F.col("total").cast("decimal(38,0)")
    cls = (
        F.when(before * 100 < total_dec * 80, "A")
        .when(before * 100 < total_dec * 95, "B")
        .otherwise("C")
    )
    return (
        local.join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(total))
        .select(cls.alias("cls"), "rev", "total")
        .groupBy("cls", "total")
        .agg(
            F.count("*").alias("customers"),
            F.sum("rev").alias("class_cents"),
        )
        .select(
            "cls",
            "customers",
            "class_cents",
            F.round(
                F.col("class_cents").cast("double") / F.col("total"), 6
            ).alias("share"),
        )
        .orderBy("cls")
    )


# --------------------------------------------------------------------------
# q160 — GINI COEFFICIENT of customer revenue: the single-number
# concentration index companion to q159's A/B/C classes (0 = perfectly
# equal spend, 1 = one customer is the whole book), via the sorted-rank
# identity G = 2*sum(i * x_(i)) / (n * sum(x)) - (n + 1)/n. Ranks come
# from the scale-safe global row_number (operators/ranking.py — never a
# single-partition window); revenue is exact integer cents, so BOTH
# inner sums are exact integers and the two divisions are evaluated
# from identical exact integers on both engines — no fold discipline
# needed. The rank-weighted sum(i*x) (~4e17 at sf0.1) and the n*total
# denominator are accumulated in decimal(38,0), matching DuckDB's
# HUGEINT promotion, so a 100x corpus widens instead of silently
# wrapping int64 (ADVICE r9).
# --------------------------------------------------------------------------
@register(
    "q160_gini_revenue",
    oracle="""
    WITH pc AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i
      FROM pc
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(rev) AS BIGINT) AS total_cents,
           ROUND(2.0 * SUM(i * rev) / (COUNT(*) * SUM(rev))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM r
    """,
    doc="Gini coefficient of customer revenue (sorted-rank identity, "
    "scale-safe global row_number, exact-cents integer sums)",
)
def q160_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.ranking import with_global_rank

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("rev"))
    )
    ranked = with_global_rank(per_cust, ["rev", "o_custkey"], "i")
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("rev").alias("total"),
        F.sum(
            F.col("i").cast("decimal(38,0)") * F.col("rev")
        ).alias("sxi"),
    )
    gini = F.round(
        F.lit(2.0) * F.col("sxi")
        / (F.col("n").cast("decimal(38,0)") * F.col("total"))
        - (F.col("n") + 1.0) / F.col("n"),
        6,
    )
    return agg.select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_cents"),
        gini.alias("gini"),
    )
