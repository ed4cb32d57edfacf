"""Streaming analytics operators: watermarked windowed aggregation and a
custom stateful sessionizer.

The reference engine is batch-only; these are the Structured-Streaming
counterparts of the batch event operators (entry_queries.ev_window_counts /
ev_sessionize) for incremental pipelines:

- `stream_window_counts`: readStream -> withWatermark + window() groupBy —
  the built-in late-data-tolerant windowed agg. State is bounded by the
  watermark (Spark drops windows older than it), so the query runs
  indefinitely at any event rate; the agg itself is the same hash-agg the
  batch plan uses, shuffled by (window, event_type).
- `stream_sessionize`: applyInPandasWithState — the custom stateful
  operator path. Per-user session state (current session start/end/count)
  lives in the state store, partitioned by user_id; an EVENT-time timeout
  (watermark passing last_event + gap) flushes idle sessions, so closure
  is driven by data time, never by wall-clock batch cadence. Emits one row
  per CLOSED session, exactly the gap-based session definition
  ev_sessionize computes in batch (gap > 30 min starts a new session), so
  a drained stream reconciles with the batch oracle.

Both run from any streaming source; tests drive them with a file source
over events parquet and availableNow triggers (bounded drain)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_GAP_S = 1800.0  # same 30-min gap as the batch ev_sessionize oracle


def stream_events_from_parquet_dir(spark: SparkSession, path: str) -> DataFrame:
    """File-arrival stream of events parquet (drop-a-file = ingest)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def stream_window_counts(
    events: DataFrame, watermark: str = "10 minutes", window: str = "5 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event_type — the
    streaming analog of ev_window_counts. Late rows within `watermark`
    still update their window; older state is dropped (bounded memory)."""
    return (
        events.withWatermark("ts", watermark)
        # group on the window STRUCT (projecting .start inside groupBy would
        # sever the event-time attribute and with it the watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sv")
    )


_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)
# state: current open session for the user
_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _sessionize_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user gap sessionizer. Events inside one micro-batch may arrive
    unsorted; sort by ts then fold into the open session, closing (and
    emitting) whenever the gap exceeds SESSION_GAP_S. The still-open
    session stays in state; a processing-time timeout flushes it."""
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n, sv = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "sum_value": [sv],
            }
        )
        return

    ts_list: list[int] = []
    val_list: list[float] = []
    for pdf in pdfs:
        ts_list.extend(pdf["ts"].astype("datetime64[us]").astype("int64").tolist())
        val_list.extend(pdf["value"].tolist())
    order = sorted(range(len(ts_list)), key=ts_list.__getitem__)

    if state.exists:
        start_us, last_us, n, sv = state.get
    else:
        start_us = last_us = None  # set on first event
        n, sv = 0, 0.0

    closed = []
    for i in order:
        t, v = ts_list[i], float(val_list[i])
        if start_us is None:
            start_us, last_us, n, sv = t, t, 1, v
        elif t < start_us:
            # late-but-above-watermark event from a LATER micro-batch landing
            # BEFORE the open session (in-batch events are sorted, so this is
            # cross-batch only). Within the gap: extend the session start
            # backwards (ADVICE r4 — previously only last_us moved, so
            # emitted sessions diverged from the batch oracle). Beyond the
            # gap: it is its own, already-superseded session — emit closed.
            # Residual divergence vs a batch oracle: a late event can't
            # re-open/bridge a session that already CLOSED before it arrived;
            # the watermark bounds how late that can happen (PLANS.md).
            if (start_us - t) / 1e6 > SESSION_GAP_S:
                closed.append((t, t, 1, v))
            else:
                start_us = t
                n += 1
                sv += v
        elif (t - last_us) / 1e6 > SESSION_GAP_S:
            closed.append((start_us, last_us, n, sv))
            start_us, last_us, n, sv = t, t, 1, v
        else:
            last_us = max(last_us, t)
            n += 1
            sv += v
    if start_us is not None:
        state.update((start_us, last_us, n, sv))
        # close when the WATERMARK passes last event + gap (event-time
        # semantics — wall-clock batch cadence can never flush early);
        # clamp above the current watermark, which may already have passed
        # for users idle far longer than the gap
        timeout_ms = max(
            last_us // 1000 + int(SESSION_GAP_S * 1000),
            state.getCurrentWatermarkMs() + 1,
        )
        state.setTimeoutTimestamp(timeout_ms)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [c[3] for c in closed],
            }
        )


def stream_sessionize(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): gap-based
    sessionization per user with EVENT-time timeouts (idle sessions close
    when the watermark passes last_event + gap). Emits one row per closed
    session; state is per-user (hash-partitioned by the state store), so
    10^9 users shard across executors with no global state."""
    return events.withWatermark("ts", watermark).groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
