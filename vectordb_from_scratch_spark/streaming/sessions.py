"""Custom stateful streaming operator: gap-based sessionization with
applyInPandasWithState — the Structured Streaming twin of
plans/relational.events_sessionize and the pattern for any custom
stateful operator the engine needs (the reference has no streaming at
all; its WAL is the closest analog, SURVEY.md §2.6).

Semantics: per user, events more than `gap` apart start a new session;
a session is EMITTED once the event-time watermark passes its last
event + gap (so it can no longer grow). State per key is one open
session (bounded memory); timed out via event-time timeout.

Scale: state is partitioned by user_id across executors; each micro-
batch touches only keys with new events or expiring timers. This is the
applyInPandasWithState contract — Arrow-batched per-key group iteration,
no row-at-a-time Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["sessionize_stream"]

OUTPUT_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long, sum_value double"
STATE_SCHEMA = "start long, end long, n long, total double"


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                    "sum_value": [total],
                }
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns → µs
        vals = rows["value"].astype(float)

        closed = []
        if state.exists:
            start, end, n, total = state.get
        else:
            start = end = None  # type: ignore[assignment]
            n, total = 0, 0.0
        for t, v in zip(ts_us, vals):
            if start is None:
                start, end, n, total = t, t, 1, float(v)
            elif t - end > gap_us:
                closed.append((start, end, n, total))
                start, end, n, total = t, t, 1, float(v)
            else:
                end, n, total = t, n + 1, total + float(v)
        state.update((int(start), int(end), int(n), float(total)))
        # wake up when the watermark passes session end + gap
        state.setTimeoutTimestamp((int(end) + gap_us) // 1000)  # ms
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                    "n_events": [n for *_, n, _t in closed],
                    "sum_value": [t for *_, t in closed],
                }
            )

    return fn


def sessionize_stream(events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"):
    """events(ts, user_id, value, …) stream → closed-session stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes * 60),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
