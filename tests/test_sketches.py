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
