"""Streaming funnel tracking: per-user ordered stage progression
(view → click → purchase) maintained across micro-batches with
applyInPandasWithState — the streaming twin of
plans/relational.events_funnel and the second custom stateful operator
next to sessions.py (the reference has no streaming surface,
SURVEY.md §2.6).

Semantics: a user advances from stage k to k+1 on the FIRST event of
stage-(k+1)'s type with ts strictly after the stage-k timestamp,
processing events in ts order — exactly the batch operator's
min-ts-after-previous chain, provided each user's events arrive in ts
order ACROSS batches (in-order sources / watermarked replays; an
out-of-order earlier event cannot retroactively advance a stage —
documented approximation, same contract as any online funnel).

State per user: (stage_reached, ts of that stage) — two fixed fields,
bounded regardless of event volume. Output: one row per ADVANCEMENT
(user_id, stage_idx, stage, ts); aggregating count(distinct user_id) per
stage_idx over the output reproduces the batch funnel counts (asserted
in tests/test_streaming_counts.py).

Scale: state is hash-partitioned by user_id; each micro-batch touches
only users with new events. Arrow-batched per-key iteration — no
row-at-a-time Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["funnel_stream", "FUNNEL_STAGES"]

FUNNEL_STAGES = ("view", "click", "purchase")

OUTPUT_SCHEMA = "user_id long, stage_idx int, stage string, ts timestamp"
STATE_SCHEMA = "reached int, t long"


def _funnel_fn(stages: tuple[str, ...]):
    n_stages = len(stages)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        if state.exists:
            reached, t_last = state.get
        else:
            reached, t_last = 0, -1  # no stage yet; any ts advances stage 1
        out_idx, out_stage, out_ts = [], [], []
        for ts, etype in zip(rows["ts"], rows["event_type"]):
            if reached >= n_stages:
                break
            t_us = int(pd.Timestamp(ts).value // 1000)
            if etype == stages[reached] and t_us > t_last:
                reached += 1
                t_last = t_us
                out_idx.append(reached)
                out_stage.append(stages[reached - 1])
                out_ts.append(pd.Timestamp(ts))
        state.update((int(reached), int(t_last)))
        if out_idx:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_idx),
                    "stage_idx": out_idx,
                    "stage": out_stage,
                    "ts": out_ts,
                }
            )

    return fn


def funnel_stream(
    events: DataFrame,
    stages: tuple[str, ...] = FUNNEL_STAGES,
    watermark: str = "1 hour",
):
    """events(ts, user_id, event_type, …) stream → stage-advancement
    stream. Pre-filters to funnel event types so state only sees
    relevant rows."""
    relevant = events.filter(events.event_type.isin(list(stages)))
    return (
        relevant.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn(tuple(stages)),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
