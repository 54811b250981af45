"""Custom stateful streaming operator: per-user session tracking via
``applyInPandasWithState`` (SURVEY.md §2.5 streaming row — the capability
class Spark's built-in windowed aggs can't express: arbitrary per-key state
with timeout-driven emission).

Semantics: events for a user belong to one session while gaps stay at or
under ``gap_seconds``; a session is emitted ONLY once the watermark passes
``session_end + gap`` — before that, any late-but-within-watermark event
could still merge into (or bridge) it, so emitting earlier would produce
split/duplicate sessions in append mode. This operator is the streaming
twin of the batch gaps-and-islands sessionization
(plans/analytics.py::sessionize_events) and matches its closed merge
boundary: events exactly ``gap`` apart merge (batch rule: a new session
starts iff ``ts - prev_ts > gap``). NOTE this deviates from Spark's
``F.session_window`` by exactly one microsecond at the boundary — its
half-open [t, t+gap) windows need strict overlap, so events exactly gap
apart do NOT merge there. The closed boundary is intentional: the batch
twin and its DuckDB oracle are the parity contract here.

Scale posture: state is a handful of open-interval tuples per user (one per
not-yet-ripe session), keyed by the groupBy — Spark shuffles each user to
one task and the state store persists per-partition (RocksDB-backed on a
real cluster). The watermark bounds both late data and state lifetime;
without it state grows O(users forever).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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

# state: parallel arrays over the user's OPEN sessions (sessions whose
# end+gap the watermark has not passed yet) — (start_us, end_us, n, value)
_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
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

    Emits one row per closed session, where "closed" means the watermark
    has passed ``session_end + gap`` — the point past which no surviving
    event can merge with it. All earlier intervals (including ones a batch
    gap would naively close mid-batch, and earlier sessions formed by late
    events) are held in state until they ripen: a late-but-within-watermark
    event landing within gap of an interval must still extend or bridge it.
    """
    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1000

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        sessions: list[tuple[int, int, int, float]] = []
        if state.exists:
            starts, ends, ns, vals = state.get
            sessions = [
                (s, e, n, v) for s, e, n, v in zip(starts, ends, ns, vals)
            ]
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs))
            rows = rows.sort_values("ts")
            # interval sessionization over the open intervals plus the
            # batch's events, in start order. A late-but-within-watermark
            # event can land anywhere relative to open intervals: in-gap
            # events extend/bridge them (min start / max end), an event
            # more than gap BEFORE every open start forms its own earlier
            # interval. Closed boundary (<=): exactly-gap-apart merges,
            # matching the batch twin (see module docstring).
            items = [
                (_us(ts), _us(ts), 1, float(val))
                for ts, val in zip(rows["ts"], rows["value"])
            ]
            items.extend(sessions)
            items.sort(key=lambda it: (it[0], it[1]))
            sessions = []
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
                    sessions.append(cur)
                    cur = it
            if cur is not None:
                sessions.append(cur)

        # a session is ripe iff the watermark is strictly past end+gap: any
        # surviving future event has ts >= watermark > end+gap, so it can
        # no longer merge (closed boundary merges at ts == end+gap exactly)
        wm_us = state.getCurrentWatermarkMs() * 1000
        ripe = [s for s in sessions if s[1] + gap_us < wm_us]
        keep = [s for s in sessions if s[1] + gap_us >= wm_us]
        if keep:
            state.update(
                (
                    [s[0] for s in keep],
                    [s[1] for s in keep],
                    [s[2] for s in keep],
                    [s[3] for s in keep],
                )
            )
            # wake when the watermark passes the EARLIEST open end+gap
            # (event-time timeout fires once the watermark moves past it);
            # Spark requires the timestamp strictly above the watermark
            state.setTimeoutTimestamp(
                max(min(s[1] for s in keep) // 1000 + gap_ms, wm_us // 1000 + 1)
            )
        elif state.exists:
            state.remove()
        if ripe:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(ripe),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in ripe],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in ripe],
                    "n_events": [c[2] for c in ripe],
                    "session_value": [c[3] for c in ripe],
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
