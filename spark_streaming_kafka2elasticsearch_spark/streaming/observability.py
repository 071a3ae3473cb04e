"""Streaming observability — progress metrics into structured logs.

The reference logs per-stage messages but has no visibility into the
running stream (rows/sec, batch duration, state size) — the numbers an
operator actually pages on.  Spark publishes exactly these through
``StreamingQueryListener``; this module forwards each progress event
into the engine's ECS JSON logger (``logging_util``) so streaming
telemetry lands in the same structured pipeline as stage logs.

At scale this is the early-warning surface: state-rows trending up
⇒ watermark misconfigured or key cardinality exploding; batch duration
approaching the trigger interval ⇒ falling behind the source.
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class EcsProgressListener(StreamingQueryListener):
    """Forward query progress to a logger and keep an in-memory ring
    of recent progress dicts (for tests and quick inspection)."""

    def __init__(self, logger: logging.Logger | None = None, keep: int = 100):
        self._log = logger or logging.getLogger("spark_streaming_kafka2elasticsearch.streaming")
        self._keep = keep
        self.progresses: list[dict[str, Any]] = []

    def onQueryStarted(self, event) -> None:
        self._log.info(
            "stream started",
            extra={"event": {"query_id": str(event.id), "name": event.name}},
        )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        total_state_rows = sum(
            (s.numRowsTotal or 0) for s in (p.stateOperators or [])
        )
        doc = {
            "query_name": p.name,
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "process_rows_per_second": p.processedRowsPerSecond,
            "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "state_rows_total": total_state_rows,
        }
        self.progresses.append(doc)
        del self.progresses[: -self._keep]
        self._log.info("stream progress", extra={"event": doc})

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self._log.info(
            "stream terminated",
            extra={
                "event": {
                    "query_id": str(event.id),
                    "exception": event.exception,
                }
            },
        )
