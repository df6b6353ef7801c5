"""Parquet table loading with nanosecond-timestamp normalization.

Spark (through 4.x) cannot read parquet TIMESTAMP(NANOS) columns natively
([PARQUET_TYPE_ILLEGAL]); with ``spark.sql.legacy.parquet.nanosAsLong=true``
(set by our session factory) they arrive as LongType nanos-since-epoch. This
loader detects such columns from the parquet footer (a driver-side metadata
read, no data scan) and converts them back to proper TimestampType by
truncating to microseconds — the same truncation DuckDB applies, so oracle
comparisons agree.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ns_timestamp_columns(path: str, loaded_dtypes: list[tuple[str, str]]) -> list[str]:
    """Names of TIMESTAMP(NANOS) columns that Spark read as raw longs.

    Cross-checks the parquet footer (Arrow reports the logical type) against
    the dtypes Spark actually produced: Spark-written INT96 timestamps also
    show up as ``timestamp[ns]`` in Arrow but load fine as TimestampType, so
    only columns that arrived as ``bigint`` need conversion.
    """
    import pyarrow.dataset as ds
    import pyarrow as pa

    loaded = dict(loaded_dtypes)
    dataset = ds.dataset(path, format="parquet")
    cols = []
    for field in dataset.schema:
        if (
            pa.types.is_timestamp(field.type)
            and field.type.unit == "ns"
            and loaded.get(field.name) == "bigint"
        ):
            cols.append(field.name)
    return cols


def convert_ns_long_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Convert raw-nanos long columns to TimestampType.

    THE single conversion rule (all call sites route here): integer ``div``,
    NOT ``/`` — epoch-nanos exceed 2^53, so double division rounds the
    microsecond value up by 1 for some rows; truncation matches DuckDB.
    """
    for c in cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load ``{sf_dir}/{name}.parquet`` (or a bare directory) with ns->us
    timestamp normalization."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        path = os.path.join(sf_dir, name)
    df = spark.read.parquet(path)
    return convert_ns_long_columns(df, ns_timestamp_columns(path, df.dtypes))
