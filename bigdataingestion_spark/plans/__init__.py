from bigdataingestion_spark.plans.chunker import Chunk, chunk_predicate, plan_chunks, profile_chunks
from bigdataingestion_spark.plans.watermark import resolve_watermark_columns, watermark_expr

__all__ = [
    "Chunk",
    "chunk_predicate",
    "plan_chunks",
    "profile_chunks",
    "resolve_watermark_columns",
    "watermark_expr",
]
