"""Source protocol.

The reference hard-wires one source kind (Databricks PostgreSQL connector,
``PostgresToDataLake_Ingestion_Notebook.py:287-297``). The rebuild makes the
source a small protocol so the identical pipeline runs against JDBC in
production and against parquet directories in tests — the orchestration,
watermarking and chunking logic never know the difference.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame

from bigdataingestion_spark.sources.querygen import TableAddress


class Source(Protocol):
    """A database-like source from which whole tables or watermark-filtered
    increments can be read as DataFrames."""

    def read_table(self, database: str, addr: TableAddress) -> DataFrame:
        """Full scan of one table (reference's selectAllQuery path)."""
        ...

    def probe_table(self, database: str, addr: TableAddress) -> DataFrame:
        """Cheap schema-resolution read (no side effects, no probes); used
        for watermark-column discovery. Defaults to read_table semantics."""
        ...

    def read_increment(
        self,
        database: str,
        addr: TableAddress,
        watermark_cols: list[str],
        last_load_date: str,
    ) -> DataFrame:
        """Rows with ``COALESCE(watermark_cols) >= last_load_date``.

        Implementations MUST evaluate the predicate as close to the source as
        possible (inside the database for JDBC; as a pushed-down parquet
        filter for files)."""
        ...
