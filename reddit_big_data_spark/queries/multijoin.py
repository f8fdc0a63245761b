"""Multi-table join planning (TPC-H Q5 shape) and ranking-function
breadth (dense_rank / percent_rank / cume_dist).

The reference's biggest join chain is two dims deep
(code/project_starter_script.py:160-170); q86 exercises the 6-table
shape a warehouse join optimizer actually faces, including a
LOCAL-supplier residual (c_nationkey = s_nationkey) that constrains the
join graph beyond the key chain. Spark-first plan: the three true dims
(supplier, nation, region) broadcast; customer⋈orders and ⋈lineitem
shuffle on their natural keys; Catalyst + AQE order the rest. At 100 TB
only orders and lineitem are fact-sized, so the single big shuffle pair
is on o_orderkey/l_orderkey — the same co-partitioning the bucketing
helper (sources/bucketing.py) would pin for repeated runs.

q87 completes the §2.5 window surface begun by q10/q11/q18 with the
rank-family functions the reference never used but any analyst will:
dense_rank (gapless), percent_rank and cume_dist (distribution
position), all over properly PARTITIONED windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q86 — TPC-H Q5 shape: revenue from LOCAL supply chains (supplier and
# customer in the same nation) per nation of one region, two order years.
# --------------------------------------------------------------------------
@register(
    "q86_local_supplier_volume",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="6-table join with local-supplier residual (TPC-H Q5 shape)",
)
def q86_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_custkey")
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supplier = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    # Dims pre-reduced and broadcast: region prunes nation, nation prunes
    # supplier BEFORE the fact join, so the big shuffle pair (orders ⋈
    # lineitem on orderkey) carries only surviving rows.
    nat = nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    supp = supplier.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        orders.join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# q87 — rank-family windows: per order priority, the top-3 customers by
# spend with dense_rank (gapless across ties), percent_rank and cume_dist
# (position within the priority's spend distribution). All windows
# PARTITIONED by priority — parallel across partitions at any scale.
# --------------------------------------------------------------------------
@register(
    "q87_rank_family",
    oracle="""
    WITH spend AS (
      SELECT o_orderpriority, o_custkey,
             ROUND(SUM(o_totalprice), 2) AS spent
      FROM orders GROUP BY 1, 2
    ),
    ranked AS (
      SELECT o_orderpriority, o_custkey, spent,
             ROW_NUMBER() OVER w AS rn,
             DENSE_RANK() OVER w AS drank,
             ROUND(PERCENT_RANK() OVER w, 6) AS prank,
             ROUND(CUME_DIST() OVER w, 6) AS cdist
      FROM spend
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY spent DESC, o_custkey)
    )
    SELECT o_orderpriority, o_custkey, spent,
           CAST(drank AS BIGINT) AS drank, prank, cdist
    FROM ranked WHERE rn <= 3
    ORDER BY o_orderpriority, rn
    """,
    doc="dense_rank / percent_rank / cume_dist over partitioned windows",
)
def q87_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_orderpriority", "o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spent")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("spent"), "o_custkey"
    )
    return (
        spend.select(
            "o_orderpriority",
            "o_custkey",
            "spent",
            F.row_number().over(w).alias("rn"),
            F.dense_rank().over(w).cast("long").alias("drank"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("o_orderpriority", F.desc("spent"), "o_custkey")
    )
