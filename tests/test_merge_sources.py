"""Data-level merge upsert + non-parquet file sources."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.merge import merge_upsert
from bigdataingestion_spark.sources.files import FileSource
from bigdataingestion_spark.sources.querygen import resolve_table


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "v"]
    )
    assert merge_upsert(spark, path, base, keys=["id"]) == 3
    src = spark.createDataFrame([(2, "B", 99), (4, "d", 40)], ["id", "name", "v"])
    assert merge_upsert(spark, path, src, keys=["id"]) == 4
    out = {r.id: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert out == {1: ("a", 10), 2: ("B", 99), 3: ("c", 30), 4: ("d", 40)}


def test_merge_upsert_idempotent(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    base = spark.createDataFrame([(1, 10), (2, 20)], ["id", "v"])
    merge_upsert(spark, path, base, keys=["id"])
    merge_upsert(spark, path, base, keys=["id"])  # same source again
    assert spark.read.parquet(path).count() == 2


def test_merge_upsert_partition_filter_preserves_outside(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    base = spark.createDataFrame(
        [(1, 2023, 10), (2, 2024, 20), (3, 2024, 30)], ["id", "year", "v"]
    )
    merge_upsert(spark, path, base, keys=["id"])
    src = spark.createDataFrame([(2, 2024, 99)], ["id", "year", "v"])
    merge_upsert(spark, path, src, keys=["id"], partition_filter=F.col("year") == 2024)
    out = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert out == {1: 10, 2: 99, 3: 30}


def test_csv_and_json_file_sources(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", 2.5)], ["id", "name", "v"]
    )
    csv_dir = tmp_path / "csvdb" / "db"
    json_dir = tmp_path / "jsondb" / "db"
    df.write.option("header", True).csv(str(csv_dir / "t.csv"))
    df.write.json(str(json_dir / "t.json"))

    addr = resolve_table("t", task="x")
    csv_src = FileSource(spark, str(tmp_path / "csvdb"), fmt="csv")
    got = csv_src.read_table("db", addr)
    assert got.count() == 2
    assert set(got.columns) == {"id", "name", "v"}
    json_src = FileSource(spark, str(tmp_path / "jsondb"), fmt="json")
    out = json_src.read_table("db", addr)
    assert out.count() == 2
    assert set(out.columns) == {"id", "name", "v"}


def test_orc_file_source_roundtrip(spark, tmp_path):
    """ORC is a first-class Spark format; FileSource passes fmt through."""
    df = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", 2.5), (3, "z", 3.5)], ["id", "name", "v"]
    )
    orc_dir = tmp_path / "orcdb" / "db"
    df.write.orc(str(orc_dir / "t.orc"))
    addr = resolve_table("t", task="x")
    got = FileSource(spark, str(tmp_path / "orcdb"), fmt="orc").read_table("db", addr)
    assert got.count() == 3
    assert set(got.columns) == {"id", "name", "v"}
    assert {r["name"] for r in got.collect()} == {"x", "y", "z"}
