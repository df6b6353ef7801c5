"""JDBC source with source-side query pushdown.

Reference behavior (``PostgresToDataLake_Ingestion_Notebook.py:287-297``):
reads a full SQL *query* (not a table) through the Databricks ``postgresql``
connector. OSS Spark equivalent is the ``jdbc`` format with the ``query``
option, which has identical pushdown semantics: the whole query string runs
inside the source database and only its result crosses the wire.

Scale notes:
  - The watermark predicate (COALESCE over several columns) is NOT pushed by
    Spark's JDBC pushdown rules, which is why the query string is generated
    by us (see ``querygen.watermark_filtered_query``) — same design decision
    as the reference (README.md:31).
  - For large tables, ``partition_column/num_partitions`` enable parallel
    fetch (N concurrent source cursors); the reference reads single-threaded
    (its README calls this "sequential data write"). Single-stream JDBC is
    the 100 TB bottleneck, so parallel fetch is on by default when a numeric
    key is configured.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from bigdataingestion_spark.sources.querygen import (
    TableAddress,
    select_all_query,
    watermark_filtered_query,
)


@dataclass
class JdbcSource:
    spark: SparkSession
    host: str
    user: str = ""
    password: str = ""
    port: int = 5432  # fixed in the reference (ING:291)
    driver: str = "org.postgresql.Driver"
    fetchsize: int = 10_000
    # optional parallel-fetch spec per table name (lowercased):
    # {"events": ("event_id", 16)} -> partitionColumn + numPartitions
    partition_spec: dict[str, tuple[str, int]] = field(default_factory=dict)
    # full JDBC url override (e.g. 'jdbc:derby:/path;create=true' in tests);
    # when set, host/port/database are ignored
    jdbc_url: str | None = None

    def _url(self, database: str) -> str:
        if self.jdbc_url:
            return self.jdbc_url
        return f"jdbc:postgresql://{self.host}:{self.port}/{database}"

    def _auth(self, reader):
        if self.user:
            reader = reader.option("user", self.user)
        if self.password:
            reader = reader.option("password", self.password)
        return reader

    def _read_query(self, database: str, query: str, table_key: str) -> DataFrame:
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self._url(database))
            .option("query", query)
            .option("driver", self.driver)
            .option("fetchsize", str(self.fetchsize))
        )
        reader = self._auth(reader)
        spec = self.partition_spec.get(table_key)
        if spec:
            col, n = spec
            # bounds come from a min/max probe query (one cheap source-side
            # aggregate, amortized against the parallel fetch it enables)
            bounds = (
                self._read_query(
                    database,
                    f'SELECT MIN("{col}") AS lo, MAX("{col}") AS hi FROM ({query}) b',
                    table_key="",
                )
                .collect()[0]
            )
            lo, hi = bounds[0], bounds[1]  # positional: engines case-fold aliases
            if lo is not None:
                # Spark requires dbtable (not query) for partitioned reads,
                # and rejects partitionColumn without BOTH bounds — so the
                # partitioned reader is only built when bounds exist (an
                # empty table/increment falls through to the plain reader)
                reader = (
                    self.spark.read.format("jdbc")
                    .option("url", self._url(database))
                    .option("dbtable", f"({query}) AS src")
                    .option("driver", self.driver)
                    .option("fetchsize", str(self.fetchsize))
                    .option("partitionColumn", f'"{col}"')
                    .option("numPartitions", str(n))
                    .option("lowerBound", str(lo))
                    .option("upperBound", str(hi))
                )
                reader = self._auth(reader)
        return reader.load()

    def probe_table(self, database: str, addr: TableAddress) -> DataFrame:
        """Schema-resolution read: never partitioned, so no min/max probe
        fires. The orchestrator uses this for watermark-column discovery —
        building the partitioned reader there would run a full-table
        MIN/MAX aggregate on the source just to throw the frame away."""
        return self._read_query(database, select_all_query(addr), table_key="")

    def read_table(self, database: str, addr: TableAddress) -> DataFrame:
        return self._read_query(database, select_all_query(addr), addr.state_key)

    def read_increment(
        self,
        database: str,
        addr: TableAddress,
        watermark_cols: list[str],
        last_load_date: str,
    ) -> DataFrame:
        q = watermark_filtered_query(addr, watermark_cols, last_load_date)
        return self._read_query(database, q, addr.state_key)
