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
    watermark: str | None = "1 hour",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: pair each left row with the right rows
    for the same `key` whose timestamp lands in
    [left_ts, left_ts + max_delay].

    The watermark on both inputs plus the two-sided time-range predicate
    is what makes state finite: left rows expire once the right watermark
    passes left_ts + max_delay, right rows once the left watermark passes
    right_ts. `right_prefix` disambiguates the right side's columns in the
    flat output (both sides carry `key`/ts names).

    how: "inner" (matches emit eagerly as both sides arrive) or
    "left_outer" (additionally emits a null-padded row for each
    unmatched left row — but only in a batch whose watermark is
    STRICTLY past left_ts + max_delay; the watermark only advances
    between batches, and availableNow runs a trailing no-data batch
    after a final-batch advance, both pinned by
    tests/test_streaming.py).

    watermark=None means the caller already watermarked both inputs
    upstream. CAUTION for left_outer over filtered branches of one
    stream: an upstream watermark does NOT guarantee the watermark
    node sees the unfiltered traffic — Catalyst pushes deterministic
    filters below EventTimeWatermark, so rows meant only to advance
    event time (heartbeats, other event types) are filtered at the
    scan and never reach the watermark node (empirically pinned by
    q146's development; see its docstring). Watermark-advancer rows
    must themselves survive every branch filter."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported stream-stream join type {how!r}")
    l = (
        left if watermark is None else left.withWatermark(left_ts, watermark)
    ).alias("l")
    r = (
        (
            right
            if watermark is None
            else right.withWatermark(right_ts, watermark)
        )
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
    return l.join(r, cond, how).drop(rk)
