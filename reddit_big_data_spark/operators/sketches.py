"""Mergeable-sketch aggregation — the pattern that makes 100 TB metrics
cheap: pre-aggregate each partition (day/shard) into a FIXED-SIZE sketch
once, then answer rollup queries by merging sketches instead of
re-scanning raw data. Spark ships Datasketches HLL natively
(hll_sketch_agg / hll_union_agg / hll_sketch_estimate), so both levels
stay in codegen'd JVM aggregates.

The two-level shape below is exactly how a hypertable/cube maintains
distinct-count metrics: level 1 runs in the daily ingest job and is tiny
(one sketch blob per (key, day)); level 2 answers "distinct over any day
range" by unioning blobs — O(days x sketch_size), never O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_sketches(
    df: DataFrame, key_col: str, id_col: str, ts_col: str = "ts"
) -> DataFrame:
    """Level 1: one HLL sketch of `id_col` per (key, day) — the
    materialize-once pre-aggregation."""
    return (
        df.withColumn("__day", F.to_date(ts_col))
        .groupBy(key_col, "__day")
        .agg(F.hll_sketch_agg(id_col).alias("sketch"))
    )


def merged_distinct(daily: DataFrame, key_col: str) -> DataFrame:
    """Level 2: distinct count per key over all days, by sketch union —
    never touches raw rows."""
    return daily.groupBy(key_col).agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_nd"),
    )


def distinct_rollup(
    df: DataFrame, key_col: str, id_col: str, ts_col: str = "ts"
) -> DataFrame:
    """(key, n_days, approx_nd, exact_nd): the merged two-level estimate
    side-by-side with the exact distinct count, so merge fidelity is
    visible in the output itself."""
    approx = merged_distinct(daily_sketches(df, key_col, id_col, ts_col), key_col)
    exact = df.groupBy(key_col).agg(
        F.countDistinct(id_col).alias("exact_nd")
    )
    return approx.join(exact, key_col).select(
        key_col, "n_days", "approx_nd", "exact_nd"
    )
