"""Custom stateful streaming operators via applyInPandasWithState.

The reference's sequence ops are batch-only (SequenceSplitTimeSeparation
.java:43 splits a fully-materialized sequence); a CDC/stream engine also
needs the ONLINE form — per-key state that survives across micro-batches,
emits results incrementally, and is evicted by event-time timeout so the
state store stays bounded. applyInPandasWithState is Spark's public API for
exactly this: Arrow-batched per-key pandas groups + a GroupState handle +
event-time timeouts tied to the watermark.

`sessionize_stream` mirrors the batch `sessionize` op's semantics (a new
session starts when the gap STRICTLY exceeds gap_seconds), so for in-order
input the emitted sessions equal the batch op's gap-split — tested against
it in tests/test_stateful_stream.py.

State layout is primitive longs (epoch microseconds), not timestamps —
the state schema round-trips through Arrow every trigger, and a flat
struct of longs is the cheapest stable encoding.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

# (start_us, last_us, count)
_SESSION_STATE = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("count", T.LongType()),
])


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming gap-sessionization: emits one row per CLOSED session
    (closed by a later event arriving past the gap, or by event-time
    timeout once the watermark passes last_event + gap). The still-open
    session per key lives in the state store and is bounded by the
    timeout — state cannot grow beyond one row per active key.

    Returns a streaming DataFrame (append output mode) with columns
    (user_id, session_start, session_end, n_events)."""
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start_us, last_us, count = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [count],
            })
            return
        if state.exists:
            start_us, last_us, count = state.get
        else:
            start_us = last_us = None
            count = 0
        closed = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            for ts in sorted(_us(t) for t in pdf[ts_col]):
                if last_us is None:
                    start_us, last_us, count = ts, ts, 1
                elif ts - last_us > gap_us:  # strict >, same as batch op
                    closed.append((start_us, last_us, count))
                    start_us, last_us, count = ts, ts, 1
                else:
                    last_us, count = max(last_us, ts), count + 1
        state.update((start_us, last_us, count))
        # close the open session via event-time timeout once the watermark
        # passes its gap horizon; timeouts must be set beyond the current
        # watermark or Spark rejects them
        horizon_ms = (last_us + gap_us) // 1000
        state.setTimeoutTimestamp(max(horizon_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            })

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, SESSION_OUTPUT, _SESSION_STATE, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


RUNNING_OUTPUT = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("batch_events", T.LongType()),
    T.StructField("total_events", T.LongType()),
])

_COUNT_STATE = T.StructType([T.StructField("total", T.LongType())])


def running_counts_stream(
    events: DataFrame, key_col: str, ts_col: str = "ts",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Minimal stateful pattern: per-key lifetime event counter emitting
    (batch_events, total_events) per trigger — the monitoring-counter shape
    (update-mode analogue; kept separate from sessionize_stream so tests
    cover both the emit-on-close and emit-every-batch state styles)."""

    def fn(key, pdfs, state: GroupState):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame({"key": [str(key[0])], "batch_events": [n],
                            "total_events": [total]})

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, RUNNING_OUTPUT, _COUNT_STATE, "append",
            GroupStateTimeout.NoTimeout,
        )
    )
