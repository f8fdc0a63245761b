"""foreachBatch exactly-once parquet sink (streaming/sinks.py): delivery
equals the source, checkpointed restarts deliver nothing twice, and a
replayed batch overwrites instead of appending."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from reddit_big_data_spark.sources.io import read_table
from reddit_big_data_spark.streaming.sinks import (
    read_sink,
    start_idempotent_parquet_sink,
)
from reddit_big_data_spark.streaming.windows import stream_events
from tests.conftest import SF_SMOKE


def _drain(spark, target, ckpt):
    q = start_idempotent_parquet_sink(
        stream_events(spark, SF_SMOKE), target, ckpt
    )
    q.awaitTermination()


def test_sink_delivers_exactly_the_source(spark, tmp_path):
    target, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, target, ckpt)
    got = read_sink(spark, target)
    src = read_table(spark, SF_SMOKE, "events")
    assert got.count() == src.count()
    # value-level spot check, not just counts
    assert (
        got.agg(F.sum("event_id")).collect()[0][0]
        == src.agg(F.sum("event_id")).collect()[0][0]
    )
    # batch_id surfaces as a prunable partition column
    assert "batch_id" in got.columns
    assert got.filter(F.col("batch_id") == 0).count() > 0


def test_sink_reader_prunes_on_batch_id(spark, tmp_path):
    """The sink's 100 TB read-side claim, pinned in the plan: batch_id is
    a partition column, so `WHERE batch_id = N` must reach the scan as a
    PartitionFilter (other batches' directories never open)."""
    target, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, target, ckpt)
    df = read_sink(spark, target).filter(F.col("batch_id") == 0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan and any("PartitionFilters: [" in ln and "batch_id" in ln for ln in scan), plan


def test_checkpointed_restart_delivers_nothing_twice(spark, tmp_path):
    target, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, target, ckpt)
    n1 = read_sink(spark, target).count()
    # Same checkpoint: the restarted query finds no unprocessed input.
    _drain(spark, target, ckpt)
    assert read_sink(spark, target).count() == n1


def test_replayed_batch_overwrites_not_appends(spark, tmp_path):
    target, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, target, ckpt)
    n1 = read_sink(spark, target).count()
    # Lost checkpoint = worst-case at-least-once replay of EVERY batch.
    # The deterministic batch_id path makes the replay overwrite itself:
    # row count must not grow.
    shutil.rmtree(ckpt)
    _drain(spark, target, str(tmp_path / "ckpt2"))
    assert read_sink(spark, target).count() == n1
