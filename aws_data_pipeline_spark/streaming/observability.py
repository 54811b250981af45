"""Streaming observability: the streaming twin of the batch pipeline's
notify/QC surface (reference O3/O8 — SNS notifications + CloudWatch metrics,
``pipeline_definition.json:61-83``, ``main.tf:444-477``).

A ``StreamingQueryListener`` receives progress/termination callbacks on the
driver — no extra actions, no polling — and forwards compact metric dicts to
the same pluggable notifier the batch pipeline uses (log / webhook / etc.).
At scale this is how you see per-batch input rates, watermark lag, and state
size without touching the query itself.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql.streaming import StreamingQueryListener

Notifier = Callable[[str, dict], None]


class NotifyingListener(StreamingQueryListener):
    """Forwards streaming lifecycle + per-batch metrics to a notifier.

    Events: ``started`` (query id/name), ``progress`` (rows, duration,
    watermark, state rows), ``terminated`` (exception or clean stop).
    """

    def __init__(self, notifier: Notifier) -> None:
        self._notify = notifier

    def onQueryStarted(self, event) -> None:
        self._notify("started", {"id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        state_rows = sum(s.numRowsTotal for s in p.stateOperators)
        self._notify(
            "progress",
            {
                "id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "batch_duration_ms": p.batchDuration,
                "watermark": p.eventTime.get("watermark"),
                "state_rows": state_rows,
            },
        )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self._notify(
            "terminated",
            {"id": str(event.id), "exception": event.exception},
        )
