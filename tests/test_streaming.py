"""Streaming extension test: drain the events file-stream through the
watermarked windowed aggregation and assert it equals the batch run of
the SAME operator (Structured Streaming's unified-model guarantee) —
which itself is oracle-checked as q51."""

from __future__ import annotations

from reddit_big_data_spark.sources.io import read_table
from reddit_big_data_spark.streaming.windows import (
    run_to_memory_sink,
    stream_events,
    windowed_counts,
)
from tests.conftest import SF_SMOKE


def test_stream_equals_batch(spark):
    stream = stream_events(spark, SF_SMOKE)
    assert stream.isStreaming
    run_to_memory_sink(windowed_counts(stream), "t_stream_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in spark.table("t_stream_counts").collect()
    }

    batch = windowed_counts(read_table(spark, SF_SMOKE, "events"))
    want = {
        (r["window_start"], r["event_type"]): (r["cnt"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 0


def test_sliding_windows_run(spark):
    stream = stream_events(spark, SF_SMOKE)
    run_to_memory_sink(
        windowed_counts(stream, window="12 hours", slide="6 hours"),
        "t_sliding_counts",
    )
    rows = spark.table("t_sliding_counts").collect()
    assert len(rows) > 0
    # each event lands in 2 overlapping 12h/6h windows => roughly double
    tumbling = windowed_counts(
        read_table(spark, SF_SMOKE, "events"), window="12 hours"
    ).count()
    assert len(rows) > tumbling
