"""Mergeable-sketch tests: union of per-day HLL sketches must equal the
single-shot sketch over all rows (merge correctness — the property the
whole pre-aggregation pattern rests on), with bounded error vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_big_data_spark.operators.sketches import (
    daily_sketches,
    distinct_rollup,
    merged_distinct,
)
from reddit_big_data_spark.sources.io import read_table
from tests.conftest import SF_SMOKE


def test_merged_equals_single_shot(spark):
    ev = read_table(spark, SF_SMOKE, "events")
    merged = {
        r["event_type"]: r["approx_nd"]
        for r in merged_distinct(
            daily_sketches(ev, "event_type", "user_id"), "event_type"
        ).collect()
    }
    single = {
        r["event_type"]: r["nd"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("nd")
        )
        .collect()
    }
    assert merged == single  # sketch union is lossless wrt one-shot build


def test_rollup_error_bounded(spark):
    ev = read_table(spark, SF_SMOKE, "events")
    rows = distinct_rollup(ev, "event_type", "user_id").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_days"] >= 1
        err = abs(r["approx_nd"] - r["exact_nd"]) / max(r["exact_nd"], 1)
        assert err < 0.02, (r["event_type"], r["approx_nd"], r["exact_nd"])


def test_cms_estimate_never_undercounts_and_is_exact_when_wide(spark):
    """Structural CMS guarantee: est >= exact for every item; with width
    far above the distinct-item count, collisions are absent on this
    fixture and the estimate is exact."""
    from reddit_big_data_spark.operators.sketches import cms_cells, cms_estimate

    rows = [(f"u{i % 7}",) for i in range(100)] + [("hot",)] * 50
    df = spark.createDataFrame(rows, "item: string")
    cells = cms_cells(df, "item", depth=4, width=4096)
    items = df.select("item").distinct()
    est = {r["item"]: r["est_count"] for r in cms_estimate(cells, items, "item", width=4096).collect()}
    exact = {r["item"]: r["cnt"] for r in df.groupBy("item").agg(__import__("pyspark").sql.functions.count("*").alias("cnt")).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    assert est == exact  # wide sketch: no collisions on 8 distinct items


def test_cms_merge_equals_single_shot(spark):
    """Merging per-shard sketches by cell sum must equal the sketch built
    in one shot over the union -- the mergeability contract that makes
    shard/day rollups O(cells), not O(rows)."""
    from pyspark.sql import functions as F

    from reddit_big_data_spark.operators.sketches import cms_cells, cms_merge

    rows = [(i % 3, f"u{i % 11}") for i in range(200)]
    df = spark.createDataFrame(rows, "shard: int, item: string")
    merged = cms_merge(cms_cells(df, "item", shard_col="shard"))
    single = cms_cells(df, "item")
    a = {(r["r"], r["c"]): r["cnt"] for r in merged.collect()}
    b = {(r["r"], r["c"]): r["cnt"] for r in single.collect()}
    assert a == b


def test_cms_overestimates_under_forced_collisions(spark):
    """width=2 forces collisions: estimates must still be >= exact (the
    one-sided error direction is the point of CMS)."""
    from pyspark.sql import functions as F

    from reddit_big_data_spark.operators.sketches import cms_cells, cms_estimate

    rows = [(f"u{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "item: string")
    cells = cms_cells(df, "item", depth=2, width=2)
    est = cms_estimate(cells, df.select("item").distinct(), "item", depth=2, width=2)
    exact = df.groupBy("item").agg(F.count("*").alias("cnt"))
    joined = est.join(exact, "item").collect()
    assert len(joined) == 50
    assert all(r["est_count"] >= r["cnt"] for r in joined)
    assert any(r["est_count"] > r["cnt"] for r in joined)  # collisions happened


def test_kmv_merge_equals_single_shot(spark):
    """Merging per-day KMV sketches must give the SAME bottom-k (hence the
    same estimates) as one sketch over all data — the mergeability
    property that makes the rollup sound."""
    from pyspark.sql import functions as F

    from reddit_big_data_spark.operators.sketches import (
        kmv_merge_estimate,
        kmv_partials,
    )
    from reddit_big_data_spark.sources.io import read_table
    from tests.conftest import SF_ORACLE

    ev = read_table(spark, SF_ORACLE, "events").withColumn(
        "__day", F.to_date("ts")
    )
    merged = {
        r["event_type"]: (r["est_nd"], r["est_p50"])
        for r in kmv_merge_estimate(
            kmv_partials(ev, "event_type", "__day", "value", k=128),
            "event_type",
            k=128,
        ).collect()
    }
    single = {
        r["event_type"]: (r["est_nd"], r["est_p50"])
        for r in kmv_merge_estimate(
            kmv_partials(
                ev.withColumn("__one", F.lit(1)), "event_type", "__one", "value", k=128
            ),
            "event_type",
            k=128,
        ).collect()
    }
    assert merged == single and len(merged) > 0


def test_kmv_estimates_within_bounds(spark):
    """KMV relative error is ~1/sqrt(k-1); assert a generous 4-sigma band
    for the distinct estimate and a sample-noise band for the median."""
    from reddit_big_data_spark.registry import all_queries
    from tests.conftest import SF_ORACLE

    rows = all_queries()["q88_kmv_rollup"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        rel = abs(r["est_nd"] - r["exact_nd"]) / r["exact_nd"]
        assert rel < 4.0 / (256 - 1) ** 0.5, (r["event_type"], rel)
        # median of a ~256-point uniform sample of the distinct values:
        # quantile error ~ 4 * 0.5/sqrt(k) of the value RANGE
        assert abs(r["est_p50"] - r["exact_p50"]) < 0.125 * (
            r["exact_p50"] * 2
        ), r
