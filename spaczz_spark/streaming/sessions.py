"""Custom stateful streaming operator: gap-based sessionization.

Demonstrates the engine's ``applyInPandasWithState`` surface (SURVEY.md
§2.4 streaming — "custom stateful operators"): per-user session assembly
with a configurable inactivity gap, where the open session is the
per-group state that survives across micro-batches.

Semantics:
- events are grouped by ``user_id``; within a batch they are sorted by
  event time (the file-source tests control cross-batch order).
- an event more than ``gap_seconds`` after the previous one CLOSES the
  open session — the closed session is emitted (append mode) — and opens
  a new one.
- the final open session per user stays in state until a later batch
  closes it (no timeout by default: at 10^12-event scale you close tails
  with one final sentinel batch or an event-time timeout — both knobs are
  orthogonal to the state logic shown here).

State is a (session_start_epoch, last_ts_epoch, n_events) triple per user
— O(users) state, independent of stream length.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["SESSION_SCHEMA", "sessionize_stream"]

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("session_start", DoubleType()),
        StructField("session_end", DoubleType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_start", DoubleType()),
        StructField("last_ts", DoubleType()),
        StructField("n_events", LongType()),
    ]
)


def _make_sessionizer(gap_seconds: float, close_tails: bool):
    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if close_tails and state.hasTimedOut:
            # event-time timeout: the watermark passed last_ts + gap, so no
            # on-time event can extend this session any more — emit the
            # tail and drop the state (exactly the close a later in-gap
            # event could otherwise never trigger)
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start, last, n)],
                columns=["user_id", "session_start", "session_end", "n_events"],
            )
            return
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple] = []
        for pdf in pdfs:
            for ts in sorted(float(t) for t in pdf["ts_epoch"]):
                if last is None:
                    start, last, n = ts, ts, 1
                elif ts - last > gap_seconds:
                    closed.append((user_id, start, last, n))
                    start, last, n = ts, ts, 1
                else:
                    last = max(last, ts)
                    n += 1
        state.update((start, last, n))
        if close_tails and last is not None:
            # fire once the event-time watermark passes the session gap;
            # clamp above the current watermark (setting a timeout at or
            # below it is an error)
            timeout_ms = int((last + gap_seconds) * 1000)
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1)
            )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return sessionize


def sessionize_stream(
    events: DataFrame,
    *,
    gap_seconds: float = 1800.0,
    id_col: str = "user_id",
    ts_col: str = "ts",
    close_tails: bool = False,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Apply the stateful sessionizer to a streaming events DataFrame.

    Returns a streaming DataFrame of CLOSED sessions
    (user_id, session_start, session_end, n_events) with epoch-second
    boundaries; wire it to any append-mode sink.

    ``close_tails=True`` adds an EVENT-TIME TIMEOUT: a watermark
    (``watermark_delay`` behind max event time) is attached and each open
    session schedules a timeout at ``last_ts + gap_seconds``; when the
    watermark passes it, the session tail is emitted and its state removed
    — a real pipeline's open sessions close without waiting for a later
    batch from the same user. Without it (default, reference-parity
    semantics) tails stay in state until a later event closes them.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ts = F.col(ts_col).cast("timestamp")
    if close_tails:
        src = events.select(
            F.col(id_col).cast("string").alias("user_id"),
            ts.alias("ts_wm"),
        ).withWatermark("ts_wm", watermark_delay).withColumn(
            "ts_epoch", F.col("ts_wm").cast("double")
        )
    else:
        src = events.select(
            F.col(id_col).cast("string").alias("user_id"),
            ts.cast("double").alias("ts_epoch"),
        )
    return src.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_seconds, close_tails),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if close_tails
            else GroupStateTimeout.NoTimeout
        ),
    )
