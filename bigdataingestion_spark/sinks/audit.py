"""Audit log and alert sink.

Reference behavior: log records are accumulated in a driver-side list and
flushed once per run via an external ``InsertLogs`` notebook
(``PostgresToDataLake_Ingestion_Notebook.py:57, :461-481``); alerts are HTML
emails sent through a housekeeping notebook on (a) per-table failure and
(b) big volume with no watermark column (ING:437, :477).

Rebuild: an append-only parquet audit table with the same
accumulate-then-flush lifecycle, and a pluggable AlertSink whose default
implementation records alerts instead of emailing (SMTP optional and out of
scope for this container). Alert *conditions* fire identically.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Protocol


@dataclass
class AuditLog:
    """Accumulate-then-flush audit log (reference loglist + InsertLogs)."""

    path: str | None = None
    notebook: str = "bigdataingestion-spark"
    records: list[dict] = field(default_factory=list)

    def add(self, message: str, count: int = 0) -> None:
        """Reference ``commonConfigs.AddLog(message, count)`` equivalent."""
        self.records.append(
            {
                "notebook": self.notebook,
                "message": message,
                "record_count": int(count),
                "logged_at": datetime.now(timezone.utc).isoformat(),
            }
        )

    def flush(self) -> None:
        """Reference ``InsertLogs(str(loglist))`` equivalent — one append per
        run. JSONL keeps the audit trail greppable without a Spark job."""
        if not self.path or not self.records:
            return
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a", encoding="utf-8") as f:
            for r in self.records:
                f.write(json.dumps(r) + "\n")
        self.records.clear()


class AlertSink(Protocol):
    def alert(self, subject: str, body: str) -> None: ...


@dataclass
class LogAlertSink:
    """Default alert sink: record alerts in memory / the audit log."""

    audit: AuditLog | None = None
    sent: list[tuple[str, str]] = field(default_factory=list)

    def alert(self, subject: str, body: str) -> None:
        self.sent.append((subject, body))
        if self.audit:
            self.audit.add(f"ALERT [{subject}]: {body}")


def missing_watermark_alert_body(table: str) -> str:
    """Reference alert text semantics (ING:436): warn that a big table has no
    watermark column. The reference hardcodes 'more than 1 million records'
    regardless of the configured limit; we keep the fixed text for parity."""
    return (
        f"WARNING!! This is just a kind reminder to add the Watermark column "
        f"for Table: {table}. Since the table contains more than 1 million "
        f"records, it is good to have Watermark column to avoid failure in future."
    )


def failure_alert_body(table: str, error: str) -> str:
    """Reference per-table failure alert (ING:476)."""
    return (
        f"The ingestion job is failing while processing Data Import for "
        f"Table: {table}. Exception: {error[:500]}"
    )
