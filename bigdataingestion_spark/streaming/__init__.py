from bigdataingestion_spark.streaming.ingest import (
    stream_file_ingest,
    stream_windowed_counts,
)
from bigdataingestion_spark.streaming.stateful import streaming_sessionize

__all__ = ["stream_file_ingest", "stream_windowed_counts", "streaming_sessionize"]
