"""Custom stateful streaming operator: per-user session tracking via
``applyInPandasWithState`` (SURVEY.md §2.5 streaming row — the capability
class Spark's built-in windowed aggs can't express: arbitrary per-key state
with timeout-driven emission).

Semantics: events for a user belong to one session while gaps stay under
``gap_seconds``; a session is emitted when state times out (no events past
the watermark for the gap duration) — the streaming twin of the batch
gaps-and-islands sessionization (plans/analytics.py::sessionize_events).

Scale posture: state is one small tuple per open session per user, keyed by
the groupBy — Spark shuffles each user to one task and the state store
persists per-partition (RocksDB-backed on a real cluster). The watermark
bounds both late data and state lifetime; without it state grows O(users
forever).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
    ]
)

# state: (session_start_epoch_us, session_end_epoch_us, n_events, value_sum)
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("val", DoubleType()),
    ]
)


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1000)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions over a stream of (user_id, ts, value) events.

    Emits one row per closed session. Events are Arrow-batched per user; the
    per-user fold merges each micro-batch into open-session state, emitting
    sessions closed either by an in-batch gap or by state timeout.
    """
    gap_us = gap_seconds * 1_000_000

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []
        if state.hasTimedOut:
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
        else:
            cur = tuple(state.get) if state.exists else None
            rows = pd.concat(list(pdfs))
            rows = rows.sort_values("ts")
            # interval sessionization over the open-session interval plus the
            # batch's events, in start order — the same merge rule as Spark's
            # session_window ([t, t+gap) windows merge iff they overlap). A
            # late-but-within-watermark event can land anywhere relative to
            # the open session: in-gap events extend it (min start/max end),
            # but an event more than gap BEFORE the session start must form
            # its own earlier session, not merge into the later one.
            items = [(_us(ts), _us(ts), 1, float(val)) for ts, val in zip(rows["ts"], rows["value"])]
            if cur is not None:
                items.append(cur)
            items.sort(key=lambda it: (it[0], it[1]))
            cur = None
            for it in items:
                if cur is None:
                    cur = it
                elif it[0] - cur[1] <= gap_us:
                    cur = (
                        cur[0],
                        max(cur[1], it[1]),
                        cur[2] + it[2],
                        cur[3] + it[3],
                    )
                else:
                    closed.append(cur)
                    cur = it
            if cur is not None:
                state.update(cur)
                # close the session gap_seconds past the newest event, by
                # event time: fires once the watermark passes it
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "session_value": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
