from bigdataingestion_spark.operators import (
    dedup,
    multimodal,
    selection,
    similarity,
    text,
)

__all__ = ["dedup", "multimodal", "selection", "similarity", "text"]
