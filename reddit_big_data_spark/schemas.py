"""Canonical StructTypes.

Two families:

1. The driver testdata tables (TESTDATA.md / FIXTURES.md §5) — declared so
   streaming readers and unit-test fixtures never rely on inference.
2. The reference's Reddit tables, reduced to the columns its workload
   actually computes over (FIXTURES.md §1-2; full 68-col submissions schema
   is nested-heavy and only needed for schema-fidelity tests).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- driver testdata ------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON string
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --- reference Reddit tables (working subset) ------------------------------
# Columns the reference workload computes over (FIXTURES.md §1-2; full
# schemas in project_eda.ipynb cell 7).

SUBMISSIONS = T.StructType(
    [
        T.StructField("subreddit", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("selftext", T.StringType()),
        T.StructField("created_utc", T.LongType()),
        T.StructField("score", T.LongType()),
        T.StructField("num_comments", T.LongType()),
        T.StructField("num_crossposts", T.LongType()),
        T.StructField("gilded", T.LongType()),
        T.StructField("is_video", T.BooleanType()),
        T.StructField("url", T.StringType()),
        T.StructField("whitelist_status", T.StringType()),
        T.StructField("is_reddit_media_domain", T.BooleanType()),
        T.StructField("permalink", T.StringType()),
    ]
)

COMMENTS = T.StructType(
    [
        T.StructField("author", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("controversiality", T.LongType()),
        T.StructField("created_utc", T.LongType()),
        T.StructField("gilded", T.LongType()),
        T.StructField("id", T.StringType()),
        T.StructField("is_submitter", T.BooleanType()),
        T.StructField("link_id", T.StringType()),
        T.StructField("parent_id", T.StringType()),
        T.StructField("score", T.LongType()),
        T.StructField("stickied", T.BooleanType()),
        T.StructField("subreddit", T.StringType()),
        T.StructField("subreddit_id", T.StringType()),
    ]
)
