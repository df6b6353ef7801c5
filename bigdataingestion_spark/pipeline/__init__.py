from bigdataingestion_spark.pipeline.orchestrator import IngestionResult, Orchestrator

__all__ = ["IngestionResult", "Orchestrator"]
