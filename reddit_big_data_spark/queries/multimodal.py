"""Multimodal/binary-column query: real binary columns (encode text ->
bytes), byte lengths, content digests — oracle-checked since both engines
agree on UTF-8 bytes, octet lengths, and md5 digests. The decode path
itself is exercised in tests/test_multimodal.py (mapInPandas plumbing
with the deterministic fake decoder)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q52 — binary payload plumbing over `documents`: text -> binary payload,
# octet length, md5 digest dedup, hex prefix bucketing. Proves binary
# columns flow through scans/aggregations like any other type.
# --------------------------------------------------------------------------
@register(
    "q52_binary_payloads",
    oracle="""
    WITH b AS (
      SELECT source,
             encode(text) AS payload,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS digest
      FROM documents
    )
    SELECT source,
           COUNT(*) AS cnt,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT digest) AS nd_digests,
           CAST(SUM(CASE WHEN substr(digest, 1, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT)
             AS low_bucket
    FROM b
    GROUP BY source
    ORDER BY source
    """,
    doc="binary payloads: encode/octet_length/md5 digest aggregation",
)
def q52_binary_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    b = docs.select(
        "source",
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("digest"),
    )
    return (
        b.groupBy("source")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("digest").alias("nd_digests"),
            F.sum(
                F.when(F.substring("digest", 1, 1) < "8", 1).otherwise(0)
            ).alias("low_bucket"),
        )
        .orderBy("source")
    )
