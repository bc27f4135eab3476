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


def _make_sessionizer(gap_seconds: float):
    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
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
) -> DataFrame:
    """Apply the stateful sessionizer to a streaming events DataFrame.

    Returns a streaming DataFrame of CLOSED sessions
    (user_id, session_start, session_end, n_events) with epoch-second
    boundaries; wire it to any append-mode sink.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    src = events.select(
        F.col(id_col).cast("string").alias("user_id"),
        F.col(ts_col).cast("timestamp").cast("double").alias("ts_epoch"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
