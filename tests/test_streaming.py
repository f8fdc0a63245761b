"""Streaming extension test: drain the events file-stream through the
watermarked windowed aggregation and assert it equals the batch run of
the SAME operator (Structured Streaming's unified-model guarantee) —
which itself is oracle-checked as q51."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_big_data_spark.sources.io import read_table
from reddit_big_data_spark.streaming.windows import (
    run_to_memory_sink,
    session_window_counts,
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


def test_session_windows_match_gaps_and_islands(spark):
    """F.session_window on the stream must produce the same session
    boundaries as the batch gaps-and-islands sessionize operator."""
    from reddit_big_data_spark.operators.temporal_joins import sessionize

    stream = stream_events(spark, SF_SMOKE)
    run_to_memory_sink(session_window_counts(stream), "t_session_counts")
    got = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in spark.table("t_session_counts").collect()
    }

    ev = read_table(spark, SF_SMOKE, "events").select("user_id", "ts", "value")
    batch = (
        sessionize(ev, "user_id", "ts", "30 minutes")
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    want = {
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want and len(want) > 0


def test_stateful_user_profiles(spark):
    """applyInPandasWithState across micro-batches must converge to the
    batch groupBy answer once the stream is drained."""
    from reddit_big_data_spark.streaming.stateful import user_profiles

    stream = stream_events(spark, SF_SMOKE)
    run_to_memory_sink(user_profiles(stream), "t_profiles", mode="update")
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 4), r["max_gap_s"])
        for r in spark.table("t_profiles").collect()
    }

    ev = read_table(spark, SF_SMOKE, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = ev.withColumn(
        "gap", F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    )
    want = {
        r["user_id"]: (r["n"], round(r["s"], 4), r["g"] or 0)
        for r in gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.max("gap").alias("g"),
        )
        .collect()
    }
    assert got == want and len(want) > 0


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
