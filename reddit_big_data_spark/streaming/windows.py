"""Structured Streaming extension (SURVEY.md §2.12): file-source stream
over the `events` table -> watermark -> tumbling/sliding event-time
windows. The reference is purely batch; this is the streaming twin of its
time_slot bucketing (reference code/eda/project_eda.py:692-701), built on
the exact operator q51 runs in batch — same F.window, same semantics, so
the batch oracle doubles as the streaming truth when the stream is fully
drained (tests/test_streaming.py).

Scale posture: a file-source stream with maxFilesPerTrigger bounds batch
size; the watermark bounds state (late rows beyond it are dropped rather
than accumulating state forever); windowed aggregation state is keyed by
(window, keys) and expires with the watermark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit schema for synthetic long-nanos event fixtures (tests write
# raw int64 pd.Timestamp.value columns); production streams derive their
# schema from the footer via _events_raw_schema.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_raw_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """readStream requires an explicit schema; derive it from the batch
    footer so the stream tracks the testdata's physical ts encoding.
    TIMESTAMP(NANOS) files arrive as long under
    spark.sql.legacy.parquet.nanosAsLong (session.py); TIMESTAMP(MICROS)
    files arrive as TIMESTAMP_NTZ. Footer-only read — no data scan,
    and cached per process (sources/io.table_schema, r16: the fresh
    inference cost ~90 ms per streaming query construction)."""
    from reddit_big_data_spark.sources.io import table_schema

    return table_schema(spark, sf_dir, "events")


def normalize_event_ts(raw: DataFrame, schema: T.StructType) -> DataFrame:
    """Normalize the physical ts encoding to a watermark-ready TIMESTAMP
    (LTZ) exactly like the batch reader (sources/io.py), so
    stream == batch holds regardless of how the file encodes time."""
    if isinstance(schema["ts"].dataType, T.LongType):
        # long nanos -> truncate to micros (DuckDB-matching, sources/io.py)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(schema["ts"].dataType, T.TimestampNTZType):
        # Watermarks demand TIMESTAMP (LTZ); NTZ->LTZ is value-preserving
        # under the UTC session timezone (session.py pins it).
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over events.parquet; ts is normalized to a
    timestamp exactly like the batch reader (sources/io.py) so
    stream == batch holds regardless of the file's physical encoding."""
    schema = _events_raw_schema(spark, sf_dir)
    # The file stream source requires a DIRECTORY; the testdata ships one
    # parquet FILE per table, so stream the parent dir filtered to it.
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw, schema)


def windowed_counts(
    events: DataFrame,
    window: str = "6 hours",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling (or sliding, if `slide` given) window counts
    per event_type — works on both a stream and a batch DataFrame (the
    cornerstone of Structured Streaming's unified model; the batch form is
    oracle-checked as q51)."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    round_to: int | None = 4,
) -> DataFrame:
    """Session windows (merge events within `gap` per user) — the built-in
    streaming twin of operators/temporal_joins.sessionize; identical
    session boundaries, asserted in tests/test_streaming.py AND pinned at
    the exact-gap boundary by test_session_window_boundary_semantics: an
    event arriving EXACTLY `gap` after the previous one merges into the
    same session (F.session_window extends while next_ts <= last_ts + gap,
    i.e. a new session only starts when next_ts > last_ts + gap — the
    same `>` rule as sessionize's gaps-and-islands flag, so q53's batch
    oracle replays q136's streaming drain verbatim).

    ``round_to=None`` keeps session sums at full double precision —
    required when a consumer AVERAGES the sums afterwards (q136): rounding
    before an average injects up to 5e-5 per session, which can flip the
    consumer's own 4-decimal rounding."""
    sum_col = F.sum("value")
    if round_to is not None:
        sum_col = F.round(sum_col, round_to)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            sum_col.alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def split_events_backlog(
    sf_dir: str, dest_dir: str, lateness_ms: int = 3_600_000
) -> tuple[str, str]:
    """Materialize the events table as a DETERMINISTIC two-file backlog
    (`a.parquet` = the older half by the epoch-ms temporal midpoint,
    `b.parquet` = the newer half) so a file-source drain with
    maxFilesPerTrigger=1 is a real MULTI-batch stream: the watermark
    advances between the two data batches, which is the precondition for
    exercising a stateful operator's incremental (fold-as-you-go) path
    rather than the everything-in-one-batch degenerate case
    (VERDICT r15 #2).

    Determinism: the cut is (min_ms + max_ms) // 2 over non-NULL event
    times — a pure function of the corpus — and batch ORDER is pinned by
    explicit mtimes (a.parquet stamped 100 s older; the file stream
    source processes oldest-mtime first), not by write-time races. NULL
    event times are dropped at write: every consumer of this backlog is
    watermark-stateful and would drop them at the stream head anyway.

    Loud preconditions instead of silent degeneration: the span must
    exceed 2x the lateness bound (guaranteeing batch 2 finalizes a
    non-empty prefix: max(a) - lateness > min(a) holds exactly when
    span > 2x lateness) and both halves must be non-empty.

    Local-tooling scope: the pandas round-trip is the TEST-CORPUS
    staging step for a bounded backlog (<=100k rows at sf0.1); a
    production backlog is already many files and needs no staging."""
    import pandas as pd  # noqa: F401 - dtype home for the ns round-trip

    import pyarrow.parquet as pq

    pdf = pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pandas()
    pdf = pdf[pdf["ts"].notna()].reset_index(drop=True)
    # pandas preserves the file's native unit (datetime64[us] for micros
    # files, [ns] for nanos files); normalize to ns BEFORE the int64 view
    # or the ms arithmetic below would be off by the unit ratio
    ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64")
    ts_ms = ts_ns // 1_000_000
    min_ms, max_ms = int(ts_ms.min()), int(ts_ms.max())
    if max_ms - min_ms <= 2 * lateness_ms:
        raise ValueError(
            f"events span {max_ms - min_ms} ms <= 2x lateness "
            f"{lateness_ms} ms: a midpoint split cannot guarantee the "
            "second batch finalizes anything — shrink the lateness bound "
            "or use a wider corpus"
        )
    cut_ms = (min_ms + max_ms) // 2
    older = pdf[ts_ms <= cut_ms]
    newer = pdf[ts_ms > cut_ms]
    if older.empty or newer.empty:  # pragma: no cover - span guard implies
        raise ValueError("degenerate midpoint split: one half is empty")
    os.makedirs(dest_dir, exist_ok=True)
    paths = []
    for name, half in (("a.parquet", older), ("b.parquet", newer)):
        out = half.assign(ts=ts_ns[half.index])  # raw epoch ns
        path = os.path.join(dest_dir, name)
        out.to_parquet(path, index=False)
        paths.append(path)
    # pin batch order: the file source sorts by modification time
    now = os.stat(paths[1]).st_mtime
    os.utime(paths[0], (now - 100, now - 100))
    return paths[0], paths[1]


def run_to_memory_sink(
    stream_df: DataFrame, table_name: str, mode: str = "complete"
) -> None:
    """Drain the stream with an availableNow trigger into an in-memory
    table (test/dev sink; production would writeStream to parquet/kafka
    with a checkpoint location)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with state
    BOUNDED by the watermark (dropDuplicatesWithinWatermark) — the
    streaming twin of the batch q30 exact-dedup path. Without the
    watermark bound, streaming dropDuplicates state grows forever; within
    it, a duplicate arriving later than the watermark delay re-emits,
    which is the documented at-least-once dedup contract for infinite
    streams."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def streaming_daily_sketches(events: DataFrame, id_col: str = "user_id") -> DataFrame:
    """The level-1 sketch INGEST job as an actual stream: one HLL sketch
    of `id_col` per (event_type, day), maintained incrementally across
    micro-batches — the streaming twin of operators/sketches.py
    daily_sketches, completing the two-level rollup story (level 2 merges
    the materialized blobs with hll_union_agg, never re-reading raw rows).

    hll_sketch_agg is a mergeable typed aggregate, so the streaming state
    per group is one fixed-size sketch blob; with a watermark the state
    for closed days would be evicted (left unwatermarked here so the
    availableNow drain is deterministic for stream==batch tests)."""
    return (
        events.withColumn("__day", F.to_date("ts"))
        .groupBy("event_type", "__day")
        .agg(F.hll_sketch_agg(id_col).alias("sketch"))
    )
