"""JSONL/CSV source readers: schema-first parsing and corrupt-record policy."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdataingestion_spark.sources.textfiles import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    split_corrupt,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)

JSONL = """\
{"id": 1, "name": "a", "score": 1.5}
{"id": 2, "name": "b", "score": 2.5}
{"id": "NOT_A_NUMBER", "name": "c", "score": 3.5}
this is not json at all
{"id": 5, "name": "e", "score": 5.5}
"""

CSV = """\
id,name,score
1,a,1.5
2,b,2.5
oops,c,not_a_double,extra,fields
5,e,5.5
"""


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "drop.jsonl"
    p.write_text(JSONL)
    return str(p)


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "drop.csv"
    p.write_text(CSV)
    return str(p)


def test_jsonl_permissive_quarantines_malformed(spark, jsonl_path):
    df = read_jsonl(spark, jsonl_path, SCHEMA)
    assert CORRUPT_COL in df.columns
    clean, quarantine = split_corrupt(df)
    ids = sorted(r["id"] for r in clean.collect())
    assert ids == [1, 2, 5]
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("NOT_A_NUMBER" in b for b in bad)
    assert any("not json" in b for b in bad)


def test_jsonl_drop_discards_malformed(spark, jsonl_path):
    df = read_jsonl(spark, jsonl_path, SCHEMA, on_malformed="drop")
    assert CORRUPT_COL not in df.columns
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 5]


def test_jsonl_failfast_raises(spark, jsonl_path):
    from pyspark.errors.exceptions.captured import SparkUpgradeException

    df = read_jsonl(spark, jsonl_path, SCHEMA, on_malformed="fail")
    with pytest.raises(Exception) as exc:
        df.collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_csv_permissive_quarantines_malformed(spark, csv_path):
    df = read_csv(spark, csv_path, SCHEMA)
    clean, quarantine = split_corrupt(df)
    assert sorted(r["id"] for r in clean.collect()) == [1, 2, 5]
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert bad == ["oops,c,not_a_double,extra,fields"]


def test_split_corrupt_rejects_non_permissive(spark, csv_path):
    df = read_csv(spark, csv_path, SCHEMA, on_malformed="drop")
    with pytest.raises(ValueError):
        split_corrupt(df)
