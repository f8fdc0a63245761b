"""Streaming sinks (§2.12 extension): exactly-once parquet delivery via
``foreachBatch`` + deterministic per-batch paths.

Structured Streaming's file sink is append-only; real pipelines need
replay-safe delivery. The standard recipe is:

1. checkpointLocation makes batch ids durable — a restarted query
   re-runs only unacknowledged batches;
2. ``foreachBatch`` writes each micro-batch to a path DERIVED FROM the
   batch id with mode=overwrite — a replayed batch overwrites its own
   previous (possibly partial) output instead of appending duplicates.

Together: at-least-once replay + idempotent write = exactly-once
delivery to readers of the target directory. The reader sees
``batch_id`` as an ordinary partition column and prunes on it.

No Delta/Iceberg dependency — plain parquet, any filesystem. At cluster
scale the same code runs unchanged; per-batch overwrite touches only
that batch's directory, never the table root.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def start_idempotent_parquet_sink(
    stream_df: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Drain ``stream_df`` into ``target_dir/batch_id=N/`` parquet,
    exactly-once, with an availableNow trigger (process everything
    pending, then stop — the batch-drain mode every test and backfill
    uses)."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Deterministic path per batch id: a replay after a crash
        # overwrites its own partial output — never duplicates rows.
        batch_df.write.mode("overwrite").parquet(
            os.path.join(target_dir, f"batch_id={batch_id}")
        )

    return (
        stream_df.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_sink(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the sink back; ``batch_id`` surfaces as a partition column
    (prunable — `WHERE batch_id = N` never touches other batches)."""
    return spark.read.option("basePath", target_dir).parquet(
        os.path.join(target_dir, "batch_id=*")
    )
