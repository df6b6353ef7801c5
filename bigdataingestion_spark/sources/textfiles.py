"""Semi-structured file sources: JSONL and CSV with an explicit schema and a
corrupt-record policy.

The reference ingests only via JDBC; a lake-scale engine also lands JSONL
and CSV drops, where malformed rows are a fact of life. These readers make
the failure policy explicit instead of inheriting Spark's silent default:

  * ``permissive`` — malformed rows parse to NULLs and the raw line is
    captured in ``_corrupt_record`` for quarantine (the schema-on-read
    analogue of the reference's alert-and-continue path)
  * ``drop``       — malformed rows are discarded (DROPMALFORMED)
  * ``fail``       — first malformed row aborts the read (FAILFAST), the
    right default for contract-bound feeds

Always schema-first: schema inference at 100 TB is an extra full scan AND a
correctness hazard (a day of all-null columns infers string, then the
mergeSchema union wars begin). Callers pass the StructType; only the
corrupt-record column is added on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"

_MODES = {"permissive": "PERMISSIVE", "drop": "DROPMALFORMED", "fail": "FAILFAST"}


def _schema_with_corrupt(schema: StructType) -> StructType:
    out = StructType(list(schema.fields))
    return out.add(CORRUPT_COL, StringType(), True)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    on_malformed: str = "permissive",
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema."""
    mode = _MODES[on_malformed]
    reader_schema = (
        _schema_with_corrupt(schema) if mode == "PERMISSIVE" else schema
    )
    return (
        spark.read.schema(reader_schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    on_malformed: str = "permissive",
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Read CSV with an explicit schema (never inferSchema — see module doc)."""
    mode = _MODES[on_malformed]
    reader_schema = (
        _schema_with_corrupt(schema) if mode == "PERMISSIVE" else schema
    )
    return (
        spark.read.schema(reader_schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a permissive read into (clean, quarantine) frames.

    ``clean`` drops the corrupt column; ``quarantine`` holds the raw lines.
    The input is cached first: Spark disallows filtering on the internal
    corrupt-record column of a streaming-parsed file scan unless the parsed
    frame is materialized (SPARK-21610), and the two outputs would otherwise
    each re-parse the files.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"not a permissive read: no {CORRUPT_COL} column")
    from bigdataingestion_spark.caching import cache_tracked

    df = cache_tracked(df)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine
