from bigdataingestion_spark.sources.base import Source
from bigdataingestion_spark.sources.files import FileSource
from bigdataingestion_spark.sources.jdbc import JdbcSource
from bigdataingestion_spark.sources.querygen import (
    TableAddress,
    resolve_table,
    select_all_query,
    watermark_filtered_query,
)

__all__ = [
    "Source",
    "FileSource",
    "JdbcSource",
    "TableAddress",
    "resolve_table",
    "select_all_query",
    "watermark_filtered_query",
]
