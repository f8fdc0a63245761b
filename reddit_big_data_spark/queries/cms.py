"""Count-min sketch query (frequency twin of q59's HLL rollup).

Full-oracle since round 5 via the error-bound-boolean contract (the
window slot it occupies is now a real green; composition is governed by
WINDOW_ORDER in queries/__init__.py). Hard numeric checks live in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_big_data_spark.registry import register
from reddit_big_data_spark.sources.io import read_table


# --------------------------------------------------------------------------
# q69 — count-min heavy hitters: CMS cells built PER EVENT-DAY shard, merged
# by cell sum (the mergeable-rollup pattern, frequency twin of q59's HLL),
# then point-queried for the exact top-20 event users.
#
# Oracle contract (the q88 pattern): the sketch hashes with xxhash64,
# which DuckDB lacks, so the query emits the SQL-checkable exact counts
# plus TWO booleans per hitter — the structural one-sided guarantee
# (est >= exact, always true for CMS) and the width bound
# (est - exact <= 8N/width, 4x the standard eps*N = 2N/width expectation;
# observed overshoot on the testdata is 0). Deterministic: xxhash64 has
# no RNG state. Merge correctness stays pinned in tests/test_sketches.py.
# --------------------------------------------------------------------------
@register(
    "q69_cms_heavy_hitters",
    oracle="""
    SELECT user_id, exact_count, TRUE AS est_ge_exact, TRUE AS est_within_eps
    FROM (
      SELECT user_id, COUNT(*) AS exact_count
      FROM events
      GROUP BY user_id
      ORDER BY exact_count DESC, user_id
      LIMIT 20
    )
    ORDER BY exact_count DESC, user_id
    """,
    doc="count-min sketch heavy hitters: sharded cells -> merge -> point "
    "query, guarantee booleans vs exact",
)
def q69_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reddit_big_data_spark.operators.sketches import (
        cms_cells,
        cms_estimate,
        cms_merge,
    )

    width = 1024
    ev = read_table(spark, sf_dir, "events").withColumn(
        "__day", F.to_date("ts")
    )
    cells = cms_merge(cms_cells(ev, "user_id", width=width, shard_col="__day"))
    exact_top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.desc("exact_count"), "user_id")
        .limit(20)
    )
    n_total = ev.select(F.count("*").alias("n"))
    return (
        cms_estimate(cells, exact_top, "user_id", width=width)
        .join(exact_top, "user_id")
        .crossJoin(F.broadcast(n_total))  # ONE-ROW scalar attach
        .select(
            "user_id",
            "exact_count",
            (F.col("est_count") >= F.col("exact_count")).alias("est_ge_exact"),
            (
                F.col("est_count") - F.col("exact_count")
                <= 8.0 * F.col("n") / width
            ).alias("est_within_eps"),
        )
        .orderBy(F.desc("exact_count"), "user_id")
    )
