"""CLONE (sinks/txlog.py TxLogTable.clone_to): Delta's shallow/deep
clone rebuilt on the txlog — zero-copy forks whose commit references the
source's files by absolute path, plus physically-copied deep backups.
The properties under test: content equality at clone time, full isolation
of subsequent writes in both directions, metadata carry-over (schema,
constraints, properties, stats, deletion vectors), DML/compact
localization of shallow-referenced data, and CDF/streaming reads of the
clone bootstrap."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.txlog import TxLogTable
from bigdataingestion_spark.sources.txlog_datasource import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk_source(spark, path, n=6):
    t = TxLogTable(str(path))
    t.append(
        spark.range(n).select(
            F.col("id"), (F.col("id") * 10).alias("value")
        )
    )
    t.append(
        spark.range(n, n + 2).select(
            F.col("id"), (F.col("id") * 10).alias("value")
        )
    )
    return t


def test_shallow_clone_reads_source_content_without_copying(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    clone = src.clone_to(spark, str(tmp_path / "dst"))
    assert _rows(clone.read(spark)) == _rows(src.read(spark))
    # zero data copied: the clone root holds only its log
    data_files = [
        f
        for root, _d, fs in os.walk(tmp_path / "dst")
        for f in fs
        if f.endswith(".parquet")
    ]
    assert data_files == []
    assert clone.history()[0]["op"] == "clone"
    assert clone.version() == 0


def test_clone_write_isolation_both_directions(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    clone = src.clone_to(spark, str(tmp_path / "dst"))
    before = _rows(src.read(spark))

    clone.append(spark.createDataFrame([(100, 1000)], ["id", "value"]))
    clone.delete(spark, "id = 0")
    assert _rows(src.read(spark)) == before  # source untouched

    src.append(spark.createDataFrame([(200, 2000)], ["id", "value"]))
    rows = _rows(clone.read(spark))
    assert (200, 2000) not in rows  # clone pinned at clone-time snapshot
    assert (100, 1000) in rows and (0, 0) not in rows


def test_shallow_clone_dml_localizes_rewrites(spark, tmp_path):
    """Copy-on-write DML on the clone rewrites the touched EXTERNAL file
    into the clone's own root; untouched files stay external refs."""
    src = _mk_source(spark, tmp_path / "src")
    clone = src.clone_to(spark, str(tmp_path / "dst"))
    clone.update(spark, "id = 1", {"value": "99"})
    rows = dict(_rows(clone.read(spark)))
    assert rows[1] == 99
    snap = clone.snapshot()
    local = [f for f in snap.files if not os.path.isabs(f)]
    external = [f for f in snap.files if os.path.isabs(f)]
    assert local and external
    # and the source still reads its own original content
    assert dict(_rows(src.read(spark)))[1] == 10


def test_shallow_clone_compact_fully_localizes(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    clone = src.clone_to(spark, str(tmp_path / "dst"))
    before = _rows(clone.read(spark))
    clone.compact(spark, target_file_bytes=1 << 30)
    snap = clone.snapshot()
    assert all(not os.path.isabs(f) for f in snap.files)
    assert _rows(clone.read(spark)) == before
    # after localization the source can vacuum without breaking the clone
    src.overwrite(spark.createDataFrame([(1, 1)], ["id", "value"]))
    src.vacuum(retention_seconds=0.0)
    assert _rows(clone.read(spark)) == before


def test_clone_carries_dvs_constraints_properties_stats(spark, tmp_path):
    src = TxLogTable(str(tmp_path / "src"))
    src.append(
        spark.range(10).select(
            F.col("id"), (F.col("id") % 3).alias("grp")
        )
    )
    src.alter_properties({"cdf.enabled": "true", "custom.key": "x"})
    src.add_constraint(spark, "nonneg", "id >= 0")
    src.delete(spark, "id = 4", deletion_vectors=True)
    clone = src.clone_to(spark, str(tmp_path / "dst"))

    # DV carried: masked row stays masked in the clone
    ids = {r[0] for r in clone.read(spark).collect()}
    assert 4 not in ids and len(ids) == 9
    snap = clone.snapshot()
    assert snap.properties["custom.key"] == "x"
    assert dict(snap.constraints)["nonneg"] == "id >= 0"
    # skipping stats carried under the absolute names
    assert set(snap.file_stats) >= set(snap.dvs)
    with pytest.raises(Exception, match="nonneg"):
        clone.append(spark.createDataFrame([(-1, 0)], ["id", "grp"]))


def test_clone_txn_ids_not_carried(spark, tmp_path):
    src = TxLogTable(str(tmp_path / "src"))
    batch = spark.createDataFrame([(1, "a")], ["id", "v"])
    src.append(batch, txn_id="app-1")
    clone = src.clone_to(spark, str(tmp_path / "dst"))
    # a replay against the CLONE is a fresh delivery (new application
    # surface), not a dedup no-op
    clone.append(batch, txn_id="app-1")
    assert clone.read(spark).count() == 2
    assert src.read(spark).count() == 1


def test_deep_clone_is_independent_of_source_vacuum(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    src.delete(spark, "id = 2", deletion_vectors=True)
    expect = _rows(src.read(spark))
    clone = src.clone_to(spark, str(tmp_path / "dst"), shallow=False)
    assert _rows(clone.read(spark)) == expect
    src.overwrite(spark.createDataFrame([(0, 0)], ["id", "value"]))
    src.vacuum(retention_seconds=0.0)
    assert _rows(clone.read(spark)) == expect
    snap = clone.snapshot()
    assert all(not os.path.isabs(f) for f in snap.files)


def test_clones_of_partitioned_table(spark, tmp_path):
    src = TxLogTable(str(tmp_path / "src"))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], ["id", "part", "value"]
    )
    src.overwrite_partitions(df, ["part"])
    clone = src.clone_to(spark, str(tmp_path / "s2"), shallow=False)
    assert _rows(clone.read(spark)) == _rows(src.read(spark))
    assert clone.snapshot().partition_cols == ("part",)


def test_shallow_clone_of_partitioned_table_symlinks_layout(
    spark, tmp_path
):
    """VERDICT r7 item 8: a shallow clone of a hive-partitioned table
    symlinks the partition layout into the clone root — zero data
    copied, refs stay RELATIVE (single basePath), clone-local DML lands
    under the clone, and the source never sees the clone's writes."""
    src = TxLogTable(str(tmp_path / "src"))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)], ["id", "part", "value"]
    )
    src.overwrite_partitions(df, ["part"])
    clone = src.clone_to(spark, str(tmp_path / "s1"))
    snap = clone.snapshot()
    assert snap.partition_cols == ("part",)
    assert all(not os.path.isabs(f) for f in snap.files)
    assert any(
        os.path.islink(os.path.join(clone.path, f)) for f in snap.files
    )
    assert _rows(clone.read(spark)) == _rows(src.read(spark))
    # partition-granular overwrite on the clone: only 'a' rewritten,
    # the source untouched
    clone.overwrite_partitions(
        spark.createDataFrame([(9, "a", 90)], ["id", "part", "value"]),
        ["part"],
    )
    assert _rows(clone.read(spark).select("id", "value")) == [
        (2, 20),
        (9, 90),
    ]
    assert _rows(src.read(spark).select("id", "value")) == [
        (1, 10),
        (2, 20),
        (3, 30),
    ]
    # the clone's own vacuum unlinks only; the source keeps its files
    clone.vacuum(retention_seconds=0.0)
    assert _rows(src.read(spark).select("id", "value")) == [
        (1, 10),
        (2, 20),
        (3, 30),
    ]
    # deep clone of the symlinked clone resolves links into real copies
    c2 = clone.clone_to(spark, str(tmp_path / "s3"), shallow=False)
    for f in c2.snapshot().files:
        assert not os.path.islink(os.path.join(c2.path, f))
    assert _rows(c2.read(spark)) == _rows(clone.read(spark))


def test_clone_refuses_existing_target(spark, tmp_path):
    src = _mk_source(spark, tmp_path / "src")
    other = TxLogTable(str(tmp_path / "dst"))
    other.append(spark.createDataFrame([(1, 1)], ["id", "value"]))
    with pytest.raises(ValueError, match="already a txlog table"):
        src.clone_to(spark, str(tmp_path / "dst"))


def test_clone_bootstrap_reads_as_cdf_inserts(spark, tmp_path):
    """read_cdf over the clone commit synthesizes bootstrap inserts with
    the source's deletion vectors applied — masked rows don't resurrect
    in a downstream CDC consumer."""
    src = TxLogTable(str(tmp_path / "src"))
    src.append(spark.range(5).select(F.col("id")))
    src.delete(spark, "id = 3", deletion_vectors=True)
    clone = src.clone_to(spark, str(tmp_path / "dst"))
    changes = clone.read_cdf(spark, from_version=-1)
    got = sorted(
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in changes.collect()
    )
    assert got == [(i, "insert", 0) for i in [0, 1, 2, 4]]


def test_clone_bootstrap_streams_through_data_source(spark, tmp_path):
    """format("txlog") CDF stream over a fresh clone delivers the
    bootstrap as DV-masked inserts."""
    src = TxLogTable(str(tmp_path / "src"))
    src.append(spark.range(4).select(F.col("id")))
    src.delete(spark, "id = 1", deletion_vectors=True)
    clone = src.clone_to(spark, str(tmp_path / "dst"))
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("txlog")
        .option("path", str(tmp_path / "dst"))
        .option("readChangeFeed", "true")
        .option("startingVersion", "0")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["id"], r["_change_type"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(0, "insert"), (2, "insert"), (3, "insert")]


def test_chained_shallow_clone_of_clone(spark, tmp_path):
    """A clone of a clone re-absolutizes: refs stay valid one more hop."""
    src = _mk_source(spark, tmp_path / "src")
    c1 = src.clone_to(spark, str(tmp_path / "c1"))
    c1.append(spark.createDataFrame([(50, 500)], ["id", "value"]))
    c2 = c1.clone_to(spark, str(tmp_path / "c2"))
    assert _rows(c2.read(spark)) == _rows(c1.read(spark))
    c2.delete(spark, "id = 50")
    assert (50, 500) in _rows(c1.read(spark))
