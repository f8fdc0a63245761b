"""Modern-engine surfaces over `events`: the mergeable KMV sketch rollup
(q88) and Spark 4 VariantType semi-structured access (q89). Split from
queries/events.py so both sit inside the driver's 50-query correctness
window (registration order == import order, queries/__init__.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q88 — KMV bottom-k sketch rollup: one mergeable sketch per (event_type,
# day) yields BOTH an approximate distinct count of `value` AND an
# approximate median, merged across days without re-scanning raw rows —
# the quantile-capable sibling of q59's HLL rollup. Rows-only contract
# (sketch internals are hash-defined, not SQL-expressible); estimator
# error bounds are pinned in tests/test_sketches.py.
# --------------------------------------------------------------------------
@register(
    "q88_kmv_rollup",
    oracle=None,
    doc="mergeable bottom-k sketch: distinct + quantile estimates per key",
)
def q88_kmv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.sketches import (
        kmv_merge_estimate,
        kmv_partials,
    )

    ev = read_table(spark, sf_dir, "events").withColumn(
        "__day", F.to_date("ts")
    )
    partials = kmv_partials(ev, "event_type", "__day", "value", k=256)
    est = kmv_merge_estimate(partials, "event_type", k=256)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("value").alias("exact_nd"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("exact_p50"),
    )
    return (
        est.join(exact, "event_type")
        .select("event_type", "est_nd", "exact_nd", "est_p50", "exact_p50")
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q89 — VariantType (Spark 4): the modern semi-structured path. q50 parses
# props with a declared from_json schema; parse_json -> VARIANT keeps the
# binary-encoded open schema instead (no schema declaration, typed access
# via variant_get, missing paths -> NULL via try_variant_get). At 100 TB
# the variant binary encoding is shredded columnar in parquet and avoids
# per-query JSON string re-parsing. Oracle: DuckDB JSON extraction — the
# RESULT contract is identical, which is the point (same answers, newer
# storage/access path).
# --------------------------------------------------------------------------
@register(
    "q89_variant_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                           BETWEEN 25 AND 75 THEN 1 END) AS BIGINT) AS mid_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS null_missing
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Spark 4 VariantType: parse_json + variant_get typed access",
)
def q89_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "long")
    missing = F.try_variant_get("v", "$.missing", "string")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.count(F.when(k.between(25, 75), 1)).alias("mid_k"),
            F.sum(F.when(missing.isNull(), 1).otherwise(0)).alias("null_missing"),
        )
        .orderBy("event_type")
    )
