from bigdataingestion_spark.sinks.audit import AlertSink, AuditLog, LogAlertSink
from bigdataingestion_spark.sinks.writer import DatalakeWriter, SinkPolicy

__all__ = ["AlertSink", "AuditLog", "LogAlertSink", "DatalakeWriter", "SinkPolicy"]
