"""Count-min sketch query (frequency twin of q59's HLL rollup).

Registered LAST on purpose: the driver's correctness gate verifies the
first 50 registrations, and q69 is rows-only (xxhash64 has no DuckDB
twin) — it must not displace an oracle-checked query from the window;
its hard checks live in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q69 — count-min heavy hitters: CMS cells built PER EVENT-DAY shard, merged
# by cell sum (the mergeable-rollup pattern, frequency twin of q59's HLL),
# then point-queried for the exact top-20 event users. Output carries the
# estimate and the exact count side by side so over-count fidelity is
# visible. Rows-only: the sketch hashes with xxhash64, which DuckDB lacks;
# tests/test_sketches.py pins (a) est >= exact always (structural CMS
# guarantee), (b) merged == single-shot cells (merge correctness), and
# (c) exactness at testdata scale where width >> distinct items.
# --------------------------------------------------------------------------
@register(
    "q69_cms_heavy_hitters",
    oracle=None,
    doc="count-min sketch heavy hitters: sharded cells -> merge -> point query",
)
def q69_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.sketches import (
        cms_cells,
        cms_estimate,
        cms_merge,
    )

    ev = read_table(spark, sf_dir, "events").withColumn(
        "__day", F.to_date("ts")
    )
    cells = cms_merge(cms_cells(ev, "user_id", shard_col="__day"))
    exact_top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.desc("exact_count"), "user_id")
        .limit(20)
    )
    return (
        cms_estimate(cells, exact_top, "user_id")
        .join(exact_top, "user_id")
        .select("user_id", "est_count", "exact_count")
        .orderBy(F.desc("exact_count"), "user_id")
    )
