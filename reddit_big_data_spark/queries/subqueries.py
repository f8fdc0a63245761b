"""Subquery-shaped relational queries: EXISTS, correlated scalar
subqueries, and NOT-EXISTS + global-scalar filters (TPC-H Q4/Q17/Q22
shapes over the driver testdata).

The reference never writes subqueries — its notebooks materialize each
intermediate DataFrame by hand (e.g. the two-step filter-then-join in
code/project_starter_script.py:141-170). These queries close that SQL
surface the Spark-first way: EXISTS becomes a LEFT SEMI join, NOT EXISTS
a LEFT ANTI join, and a correlated scalar subquery becomes an aggregate
joined back on its correlation key — the same decorrelation Catalyst
itself performs, written explicitly so the physical plan is the one we
want at 100 TB:

- semi/anti joins shuffle once on the correlation key and never widen the
  probe side (no duplicate-row blowup a plain inner join would cause);
- the per-key aggregate side of a decorrelated scalar subquery is tiny
  (one row per key) and broadcast-able;
- a GLOBAL scalar (one row) is a broadcast nested-loop of exactly one
  value — free at any scale.

Oracles state the same queries in their natural subquery form, so the
checks also pin semi/anti decorrelation equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q78 — EXISTS via LEFT SEMI join with a non-equi residual (TPC-H Q4
# shape): orders placed in 1996 that had at least one line item shipped
# more than 30 days after the order date, counted per priority.
# Scale: one shuffle on orderkey; the semi join keeps the orders side
# at-most-once regardless of lineitem fan-out.
# --------------------------------------------------------------------------
@register(
    "q78_exists_late_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="EXISTS -> left semi join with non-equi residual (TPC-H Q4 shape)",
)
def q78_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q79 — correlated scalar subquery decorrelated into an aggregate join
# (TPC-H Q17 shape): revenue from small-quantity orders, where "small" is
# relative to each part's own average quantity. The per-part average is
# |part| rows — broadcast onto the lineitem scan, so the fact table is
# read and shuffled exactly once (for its own aggregate).
# --------------------------------------------------------------------------
@register(
    "q79_below_avg_quantity",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_small,
           ROUND(SUM(l_extendedprice), 2) AS small_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < (
      SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = p_partkey
    )
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="correlated scalar subquery -> broadcast per-key aggregate join (TPC-H Q17 shape)",
)
def q79_below_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # Decorrelated subquery: one row per partkey, the size of the part dim.
    per_part = lineitem.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("__half_avg")
    )
    return (
        lineitem.join(F.broadcast(per_part), "l_partkey")
        .filter(F.col("l_quantity") < F.col("__half_avg"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small"),
            F.round(F.sum("l_extendedprice"), 2).alias("small_revenue"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
# q80 — global scalar subquery + NOT EXISTS (TPC-H Q22 shape): "dormant
# high-balance customers" — above the positive-balance average, with no
# order since 2000. The global average is a single broadcast row; the
# NOT EXISTS is a left anti join against the pruned orders scan (the
# date filter pushes down to the parquet reader before the shuffle).
# --------------------------------------------------------------------------
@register(
    "q80_dormant_high_balance",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="global scalar subquery + NOT EXISTS -> broadcast scalar + left anti join (TPC-H Q22 shape)",
)
def q80_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    recent = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    avg_pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# q120 — NOT-IN subquery + distinct-count rollup (TPC-H Q16 shape,
# adapted: the testdata has no partsupp, so lineitem's (l_partkey,
# l_suppkey) plays the part-supplier relationship, and the blacklist
# excludes one nation's suppliers instead of comment-matched ones). The
# shapes under test: NOT IN -> broadcast LEFT ANTI join (never a filter
# against a collected list) and COUNT(DISTINCT) over the joined relation.
# --------------------------------------------------------------------------
@register(
    "q120_supplier_diversity",
    oracle="""
    WITH blacklist AS (
      SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_0'
    ),
    rel AS (
      SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
      FROM lineitem
      WHERE l_suppkey NOT IN (SELECT s_suppkey FROM blacklist)
    )
    SELECT p_brand, p_size,
           CAST(COUNT(DISTINCT suppkey) AS BIGINT) AS supplier_cnt
    FROM rel JOIN part ON p_partkey = partkey
    WHERE p_size <= 25
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    LIMIT 20
    """,
    doc="NOT IN -> anti join + distinct suppliers per part group (TPC-H Q16 shape)",
)
def q120_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_0"
    )
    blacklist = (
        read_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    rel = (
        read_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .join(
            F.broadcast(blacklist),
            F.col("suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .distinct()
    )
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 25)
        .select("p_partkey", "p_brand", "p_size")
    )
    return (
        rel.join(F.broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q121 — correlated EXISTS + NOT-EXISTS pair (TPC-H Q21 shape): suppliers
# who were the SOLE late supplier in a multi-supplier order. Decorrelated
# Spark-first: the per-order supplier/late-supplier profiles come from
# ONE aggregation over the fact (count distinct suppliers, count distinct
# LATE suppliers), and the EXISTS/NOT-EXISTS pair becomes a filter on
# that profile joined back to the late rows — the fact table is scanned
# once and shuffled once, vs the naive twice-correlated rewrite's two
# extra self-joins.
# --------------------------------------------------------------------------
@register(
    "q121_sole_late_supplier",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    ),
    prof AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
      FROM li GROUP BY l_orderkey
    ),
    sole AS (
      SELECT DISTINCT li.l_orderkey, li.l_suppkey
      FROM li JOIN prof USING (l_orderkey)
      WHERE li.late = 1 AND prof.n_supp > 1 AND prof.n_late = 1
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM sole JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="sole-late-supplier waits: EXISTS/NOT-EXISTS pair as one fact "
    "profile (TPC-H Q21 shape)",
)
def q121_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
            )
            .cast("int")
            .alias("late"),
        )
    )
    prof = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
    )
    sole = (
        li.filter(F.col("late") == 1)
        .join(
            prof.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        sole.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q127 — top supplier by period revenue (TPC-H Q15 shape): the
# view-plus-scalar-subquery classic — quarterly revenue per supplier,
# then the supplier(s) whose revenue EQUALS the global max. Spark-first
# decorrelation: the per-supplier aggregate is computed ONCE (|supplier|
# rows), the global max over it is a single broadcast row (a 1-value
# broadcast nested-loop, free at any scale), and the equality filter +
# supplier-dim broadcast join run over the already-tiny aggregate — the
# fact table is scanned and shuffled exactly once, for its own groupBy.
# The max-equality compares each engine's OWN unrounded sum (TPC-H Q15
# semantics), so cross-engine last-ulp summation noise cannot flip the
# argmax unless two suppliers genuinely tie to ~1e-10 relative — rounding
# happens only on output.
# --------------------------------------------------------------------------
@register(
    "q127_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           ROUND(total_revenue, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="top supplier by period revenue: scalar-max over a reused aggregate view (TPC-H Q15 shape)",
)
def q127_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    # Global scalar max as a one-row broadcast; the equality filter then
    # runs on the |supplier|-sized aggregate, never on the fact scan.
    top = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(
            F.broadcast(supplier),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )
