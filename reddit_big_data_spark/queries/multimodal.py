"""Multimodal/binary-column queries: real binary columns (encode text ->
bytes), byte lengths, content digests — and the real-codec pipeline
(q169), where payloads are genuine BMP/WAV/RBV1 bytes encoded AND decoded
executor-side by functions/codecs.py. The mapInPandas plumbing with the
format-agnostic fake decoder is exercised in tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.functions.multimodal import (
    MEDIA_EVERY,
    decode_stats,
    synth_codec_media,
)
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


# --------------------------------------------------------------------------
# q169 — REAL-codec decoded stats (VERDICT r12 #2). One media row per
# documents row with doc_id % 29 == 0; payload unit values are a closed
# form of (doc_id, unit index), so Spark goes formula -> encode (real
# 24-bit BMP / 16-bit PCM WAV / RBV1 frame container) -> bytes -> DECODE
# -> integer stats, while the oracle replays the generative arithmetic
# directly. Position-weighted sums make the compare sensitive to row
# order, BGR<->RGB channel order, row padding, and RIFF chunk walking —
# any codec bug breaks the hash. All emissions are exact integers
# (operators/exact.py discipline: no cross-engine rounding exposure).
# --------------------------------------------------------------------------
@register(
    "q169_codec_stats",
    oracle="""
    WITH m AS (
      SELECT doc_id, doc_id // 29 AS rnk
      FROM documents
      WHERE doc_id % 29 = 0
    ),
    img AS (
      SELECT doc_id, 8 + rnk % 9 AS w, 8 + rnk % 7 AS h
      FROM m WHERE rnk % 3 = 0
    ),
    img_units AS (
      SELECT doc_id, w, h, unnest(range(w * h * 3)) AS i FROM img
    ),
    img_doc AS (
      SELECT doc_id, w, h,
             SUM((doc_id * 7 + i * 13) % 256) AS vs,
             SUM((1 + i % 7) * ((doc_id * 7 + i * 13) % 256)) AS ws
      FROM img_units GROUP BY doc_id, w, h
    ),
    img_stats AS (
      SELECT 'image' AS kind,
             COUNT(*) AS cnt,
             SUM(54 + h * ((w * 3 + 3) // 4 * 4)) AS pb,
             SUM(w * h * 3) AS un,
             SUM(vs) AS vsum, SUM(ws) AS wsum, SUM(w + h) AS dsum
      FROM img_doc GROUP BY kind
    ),
    aud AS (
      SELECT doc_id, 256 + rnk % 199 AS n, 8000 + 100 * (rnk % 5) AS rate
      FROM m WHERE rnk % 3 = 1
    ),
    aud_units AS (
      SELECT doc_id, n, rate, unnest(range(n)) AS i FROM aud
    ),
    aud_doc AS (
      SELECT doc_id, n, rate,
             SUM((doc_id * 31 + i * 17) % 4001 - 2000) AS vs,
             SUM((1 + i % 7) * ((doc_id * 31 + i * 17) % 4001 - 2000)) AS ws
      FROM aud_units GROUP BY doc_id, n, rate
    ),
    aud_stats AS (
      SELECT 'audio' AS kind, COUNT(*) AS cnt,
             SUM(44 + 2 * n) AS pb, SUM(n) AS un,
             SUM(vs) AS vsum, SUM(ws) AS wsum, SUM(rate) AS dsum
      FROM aud_doc GROUP BY kind
    ),
    vid AS (
      SELECT doc_id, 1 + rnk % 4 AS nf FROM m WHERE rnk % 3 = 2
    ),
    vid_units AS (
      SELECT doc_id, nf, f, unnest(range(48)) AS i
      FROM (SELECT doc_id, nf, unnest(range(nf)) AS f FROM vid)
    ),
    vid_doc AS (
      SELECT doc_id, nf,
             SUM((doc_id * 7 + f * 29 + i * 13) % 256) AS vs,
             SUM((1 + (f * 48 + i) % 7)
                 * ((doc_id * 7 + f * 29 + i * 13) % 256)) AS ws
      FROM vid_units GROUP BY doc_id, nf
    ),
    vid_stats AS (
      SELECT 'video' AS kind, COUNT(*) AS cnt,
             SUM(8 + 106 * nf) AS pb, SUM(48 * nf) AS un,
             SUM(vs) AS vsum, SUM(ws) AS wsum, SUM(nf) AS dsum
      FROM vid_doc GROUP BY kind
    )
    SELECT kind,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(pb AS BIGINT) AS total_payload_bytes,
           CAST(un AS BIGINT) AS total_units,
           CAST(vsum AS BIGINT) AS value_sum,
           CAST(wsum AS BIGINT) AS weighted_sum,
           CAST(dsum AS BIGINT) AS dim_sum
    FROM (
      SELECT * FROM img_stats
      UNION ALL SELECT * FROM aud_stats
      UNION ALL SELECT * FROM vid_stats
    )
    ORDER BY kind
    """,
    doc="real BMP/WAV/RBV1 codec round trip: decoded integer stats per kind",
)
def q169_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % MEDIA_EVERY == 0)
    )
    stats = decode_stats(synth_codec_media(ids))
    return (
        stats.groupBy("kind")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("payload_bytes").alias("total_payload_bytes"),
            F.sum("units").alias("total_units"),
            F.sum("value_sum").alias("value_sum"),
            F.sum("weighted_sum").alias("weighted_sum"),
            F.sum("dim_sum").alias("dim_sum"),
        )
        .orderBy("kind")
    )
