"""Streaming joins (SURVEY.md §2.12 extension): the two join flavors
Structured Streaming supports beyond windowed aggregation.

- **stream-static enrich**: a stream joined to a batch dimension. The dim
  is broadcast into every micro-batch (re-resolved per batch, so a
  refreshed dim table is picked up) — the streaming twin of the batch J1
  broadcast dim joins (q05/q21).
- **stream-stream interval join**: two streams joined on an equi-key plus
  an event-time range (the canonical click-attribution shape). BOTH sides
  carry watermarks and the join condition bounds right-ts to a window
  after left-ts, so each side's state store holds only rows inside the
  watermark + interval horizon — without the time bound Spark would have
  to buffer both streams forever (it rejects the plan).

Both return DataFrames usable in batch mode too (unified model): the
batch twin on the same inputs is the correctness oracle in
tests/test_streaming.py — drain the stream, compare row sets exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: attach dimension attributes to each event.
    The static side is broadcast (dims are small by definition here);
    inner/left are the modes streaming supports for a static right side."""
    return stream.join(F.broadcast(dim), key, how)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "30 minutes",
    watermark: str = "1 hour",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream inner join: pair each left row with the right rows
    for the same `key` whose timestamp lands in
    [left_ts, left_ts + max_delay].

    The watermark on both inputs plus the two-sided time-range predicate
    is what makes state finite: left rows expire once the right watermark
    passes left_ts + max_delay, right rows once the left watermark passes
    right_ts. `right_prefix` disambiguates the right side's columns in the
    flat output (both sides carry `key`/ts names)."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = (
        right.withWatermark(right_ts, watermark)
        .select(
            F.col(key).alias(f"{right_prefix}{key}"),
            F.col(right_ts).alias(f"{right_prefix}{right_ts}"),
            *[
                F.col(c).alias(f"{right_prefix}{c}")
                for c in right.columns
                if c not in (key, right_ts)
            ],
        )
        .alias("r")
    )
    rk, rt = f"{right_prefix}{key}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col(rk))
        & (F.col(rt) >= F.col(left_ts))
        & (F.col(rt) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner").drop(rk)
