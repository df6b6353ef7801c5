"""StreamingQueryListener -> audit-log bridge.

The reference audits every batch run through its ``AddLog``/``InsertLogs``
pair (``PostgresToDataLake_Ingestion_Notebook.py:57, :461-481``);
``sinks.audit.AuditLog`` rebuilds that lifecycle for batch. This listener
extends the same audit trail to Structured Streaming: query start, per-batch
progress (with input row counts), and termination (with the failure message,
mirroring the reference's per-table error isolation) land in the same JSONL
file the batch pipeline writes.

Events arrive on the listener bus asynchronously, so each one is flushed
immediately rather than accumulated — a crashed driver loses at most the
in-flight event, and the audit file stays append-only (no Spark job, no
shuffle; scale-free by construction).
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener

from bigdataingestion_spark.sinks.audit import AuditLog


class AuditStreamingListener(StreamingQueryListener):
    """Register with ``spark.streams.addListener`` to audit every stream."""

    def __init__(self, audit: AuditLog):
        self._audit = audit

    def _log(self, message: str, count: int = 0) -> None:
        self._audit.add(message, count)
        self._audit.flush()

    def onQueryStarted(self, event) -> None:
        self._log(f"stream started: {event.name or event.id}")

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._log(
            f"stream progress: {p.name or p.id} batch={p.batchId}",
            int(p.numInputRows),
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        if event.exception:
            self._log(f"stream failed: {event.id} {event.exception}")
        else:
            self._log(f"stream finished: {event.id}")
