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
    for the distinct estimate and a sample-noise band for the median.
    (Runs the operators directly — q88 itself now projects only the
    boolean bound checks, whose truth this test pins numerically.)"""
    from reddit_big_data_spark.operators.sketches import (
        kmv_merge_estimate,
        kmv_partials,
    )
    from reddit_big_data_spark.sources.io import read_table
    from tests.conftest import SF_ORACLE

    ev = read_table(spark, SF_ORACLE, "events").withColumn(
        "__day", F.to_date("ts")
    )
    est = kmv_merge_estimate(
        kmv_partials(ev, "event_type", "__day", "value", k=256),
        "event_type",
        k=256,
    )
    exact = (
        ev.select("event_type", "value")
        .distinct()
        .groupBy("event_type")
        .agg(
            F.count("*").alias("exact_nd"),
            F.expr("percentile(value, 0.5)").alias("exact_p50"),
        )
    )
    rows = est.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        rel = abs(r["est_nd"] - r["exact_nd"]) / r["exact_nd"]
        assert rel < 4.0 / (256 - 1) ** 0.5, (r["event_type"], rel)
        # median of a ~256-point uniform sample of the distinct values:
        # quantile error ~ 4 * 0.5/sqrt(k) of the value RANGE
        assert abs(r["est_p50"] - r["exact_p50"]) < 0.125 * (
            r["exact_p50"] * 2
        ), r


# ---------------------------------------------------------------------------
# t-digest (operators/tdigest.py): rank-error bounds + mergeability
# ---------------------------------------------------------------------------


def test_tdigest_rank_error_bounded():
    """Pure-numpy core: for uniform, heavy-tailed and TIED (discrete)
    data, every estimated quantile's realized rank stays within 2pp of
    the target (observed worst case ~1.25pp on ties, delta=100)."""
    import numpy as np

    from reddit_big_data_spark.operators.tdigest import _compress, _quantile

    rng = np.random.RandomState(7)
    for data in (
        rng.uniform(0, 100, 20000),
        rng.lognormal(0, 2, 20000),
        rng.randint(0, 50, 20000).astype(float),
    ):
        m, w = _compress(data, np.ones_like(data), 100)
        assert len(m) <= 200  # fixed-size contract
        assert abs(w.sum() - len(data)) < 1e-6
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            est = _quantile(m, w, data.min(), data.max(), q)
            rank = (data <= est).mean()
            assert abs(rank - q) <= 0.02, (q, rank)


def test_tdigest_merge_of_parts_matches_whole():
    """The rollup contract: merging per-part digests must estimate like a
    single whole-data digest (both within 2pp rank error of truth)."""
    import numpy as np

    from reddit_big_data_spark.operators.tdigest import _compress, _quantile

    rng = np.random.RandomState(11)
    data = rng.lognormal(0, 2, 40000)
    ms, ws = [], []
    for p in np.array_split(data, 8):
        m, w = _compress(p, np.ones_like(p), 100)
        ms.append(m)
        ws.append(w)
    mm, mw = _compress(np.concatenate(ms), np.concatenate(ws), 100)
    assert abs(mw.sum() - len(data)) < 1e-6
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = _quantile(mm, mw, data.min(), data.max(), q)
        rank = (data <= est).mean()
        assert abs(rank - q) <= 0.02, (q, rank)


def test_tdigest_spark_rollup_matches_exact(spark):
    """End-to-end Spark path: per-(key, day) partials merged per key must
    land within a 5pp rank band of the exact percentiles (the q97
    contract), for every key."""
    from reddit_big_data_spark.operators.tdigest import tdigest_quantiles
    from reddit_big_data_spark.sources.io import read_table
    from tests.conftest import SF_ORACLE

    ev = read_table(spark, SF_ORACLE, "events").withColumn(
        "__day", F.to_date("ts").cast("string")
    )
    est = tdigest_quantiles(
        ev, "event_type", "__day", "value", quantiles=[0.1, 0.5, 0.9]
    )
    exact = ev.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(value, {q})").alias(f"p{int(q*100):02d}")
            for q in (0.05, 0.15, 0.45, 0.55, 0.85, 0.95)
        ]
    )
    rows = est.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        assert r["p05"] <= r["est_q10"] <= r["p15"], r
        assert r["p45"] <= r["est_q50"] <= r["p55"], r
        assert r["p85"] <= r["est_q90"] <= r["p95"], r


def test_kmv_overlap_empty_group_fails_loudly(spark):
    """ADVICE r6: an empty group used to yield NULL sketches and one
    GARBAGE estimate row (est_union NULL/-1) that flowed silently into
    downstream math. The empty-group guard now raises inside the output
    column (un-prunable), matching sample_train_matrix's loud contract."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from reddit_big_data_spark.operators.sketches import kmv_overlap_estimate

    df = spark.createDataFrame(
        [("a", i) for i in range(50)], "g: string, v: long"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei:
        kmv_overlap_estimate(df, "g", "v", "a", "nope", k=16).collect()
    assert "empty group" in str(ei.value)
    # review r7: the guard must survive COLUMN PRUNING — projecting only
    # est_jaccard used to bypass the est_union-only guard silently
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei2:
        kmv_overlap_estimate(df, "g", "v", "a", "nope", k=16).select(
            "est_jaccard"
        ).collect()
    assert "empty group" in str(ei2.value)
    # sanity: both groups present still estimates fine
    df2 = df.union(
        spark.createDataFrame([("b", i) for i in range(25, 75)], "g: string, v: long")
    )
    row = kmv_overlap_estimate(df2, "g", "v", "a", "b", k=16).collect()[0]
    assert row["est_union"] is not None and row["est_union"] > 0


def test_bitmap_partials_merge_exactly_and_stay_bounded(spark):
    """The bitmap rollup's two contracts: (1) OR-merging per-day partials
    gives EXACTLY the distinct count of the union (no estimator error,
    including ids duplicated across days and ids 32768 apart that share
    a bit position in different buckets); (2) a partial blob never
    exceeds the fixed 4 KiB bucket width regardless of row count."""
    import datetime as dt

    from pyspark.sql import functions as F

    from reddit_big_data_spark.operators.sketches import (
        bitmap_daily_partials,
        bitmap_distinct_rollup,
    )

    d1, d2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    # day 1: ids 0..999 twice (duplicates); day 2: 500..1499 (overlap
    # with day 1) plus 32768+500 (same bit position as 500, other bucket)
    rows = (
        [("k", d1, i) for i in range(1000)]
        + [("k", d1, i) for i in range(1000)]
        + [("k", d2, i) for i in range(500, 1500)]
        + [("k", d2, 32768 + 500)]
    )
    df = spark.createDataFrame(rows, "g string, ts timestamp, id long")
    partials = bitmap_daily_partials(df, "g", "id")
    out = bitmap_distinct_rollup(partials, "g").collect()[0]
    assert out["nd"] == 1501  # 0..1499 plus 33268 — exact across buckets
    assert out["n_days"] == 2
    assert out["max_daily_nd"] == 1001  # day 2: 1000 ids + the far bucket
    sizes = partials.select(F.octet_length("bm").alias("n")).collect()
    assert all(r["n"] <= 4096 for r in sizes)
