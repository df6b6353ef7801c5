from bigdataingestion_spark.streaming.ingest import (
    stream_file_ingest,
    stream_windowed_counts,
)

__all__ = ["stream_file_ingest", "stream_windowed_counts"]
