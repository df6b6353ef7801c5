"""Batch change-feed reads through format("txlog") — Delta's
table_changes surface: option("readChangeFeed","true") + startingVersion
[+ endingVersion] on spark.read yields the commits' row-level changes,
tagged _change_type/_commit_version, via the same walk as the streaming
feed (one input partition per change file)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.txlog import TxLogTable
from bigdataingestion_spark.sources.txlog_datasource import register


@pytest.fixture()
def _reg(spark):
    register(spark)


def _mk(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    t.alter_properties({"cdf.enabled": "true"})
    t.delete(spark, "id = 1")
    t.update(spark, "id = 2", {"v": "'B'"})
    t.append(spark.createDataFrame([(3, "c")], ["id", "v"]))
    return t


def _read(spark, path, start, end=None):
    r = (
        spark.read.format("txlog")
        .option("readChangeFeed", "true")
        .option("startingVersion", start)
    )
    if end is not None:
        r = r.option("endingVersion", end)
    return r.load(path)


def test_batch_cdf_matches_native_read_cdf(spark, tmp_path, _reg):
    t = _mk(spark, tmp_path)
    got = _read(spark, t.path, 0)
    want = t.read_cdf(spark, from_version=-1)
    cols = ["id", "v", "_change_type", "_commit_version"]
    assert sorted(got.columns) == sorted(want.columns)
    assert sorted(tuple(r) for r in got.select(cols).collect()) == sorted(
        tuple(r) for r in want.select(cols).collect()
    )


def test_ending_version_bounds_range(spark, tmp_path, _reg):
    t = _mk(spark, tmp_path)
    # only the delete commit (v2): its single change row
    got = _read(spark, t.path, 2, end=2).collect()
    assert [(r["_change_type"], r["id"]) for r in got] == [("delete", 1)]
    with pytest.raises(Exception, match="latest"):
        _read(spark, t.path, 0, end=t.version() + 5).collect()


def test_dv_delete_changes_delivered(spark, tmp_path, _reg):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.range(0, 10).select(F.col("id")))
    t.alter_properties({"cdf.enabled": "true"})
    v = t.delete(spark, "id >= 7", deletion_vectors=True)
    got = _read(spark, t.path, v).collect()
    assert sorted((r["_change_type"], r["id"]) for r in got) == [
        ("delete", 7),
        ("delete", 8),
        ("delete", 9),
    ]


def test_mapped_table_stable_range_reads(spark, tmp_path, _reg):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.enable_column_mapping()
    t.rename_column("v", "name")
    start = t.version() + 1  # range entirely AFTER the rename
    t.alter_properties({"cdf.enabled": "true"})
    t.append(spark.createDataFrame([(2, "b")], ["id", "name"]))
    t.delete(spark, "id = 1")
    got = _read(spark, t.path, start)
    rows = sorted(
        (r["_change_type"], r["id"], r["name"]) for r in got.collect()
    )
    assert rows == [("delete", 1, "a"), ("insert", 2, "b")]


def test_range_crossing_rename_refuses_with_guidance(spark, tmp_path, _reg):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.enable_column_mapping()
    t.rename_column("v", "name")
    with pytest.raises(Exception, match="read_cdf"):
        _read(spark, t.path, 0).collect()


def test_snapshot_options_refused_on_feed(spark, tmp_path, _reg):
    """version/timestamp/partitionFilter/statsFilter have no meaning on
    a change feed — silently ignoring them would hand back broader
    results than asked for."""
    t = _mk(spark, tmp_path)
    with pytest.raises(Exception, match="incompatible with readChangeFeed"):
        (
            spark.read.format("txlog")
            .option("readChangeFeed", "true")
            .option("version", 1)
            .load(t.path)
            .collect()
        )


def test_starting_version_beyond_latest_refuses(spark, tmp_path, _reg):
    """A mis-tracked cursor must fail loudly, not poll forever-empty."""
    t = _mk(spark, tmp_path)
    with pytest.raises(Exception, match="latest"):
        _read(spark, t.path, t.version() + 7).collect()
    # AT the latest version is fine (empty feed for start == latest+0
    # means 'changes after latest-1', which exists)
    assert _read(spark, t.path, t.version()).count() >= 1


def test_restore_in_range_refuses(spark, tmp_path, _reg):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    v0 = t.version()
    t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
    t.restore(v0)
    with pytest.raises(Exception, match="restore"):
        _read(spark, t.path, 0).collect()
