"""Protocol table features (Delta's reader/writer features contract):
commits record which features a correct reader or writer MUST implement;
a build that does not know a required reader feature refuses the read
(proceeding would silently return wrong rows — e.g. deleted rows
resurrected by ignoring deletion vectors), an unknown writer-only feature
refuses writes but allows reads. Features are monotone unions over the
log, survive checkpoint rolls, and are auto-recorded at first use."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.txlog import (
    TxLogTable,
    UnsupportedTableFeatureError,
)


def _mk(spark, tmp_path, name="t", **kw):
    t = TxLogTable(str(tmp_path / name), **kw)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    return t


def _inject_feature(t, reader=(), writer=()):
    """Hand-craft the next commit as a FUTURE build would write it:
    metadata-only, requiring features this build does not know."""
    v = t.version() + 1
    snap = t.snapshot()
    entry = {
        "version": v,
        "op": "enable_feature",
        "ts": 0.0,
        "add": [],
        "remove": [],
        "schema": snap.schema_json,
        "txn_id": None,
        "partition_cols": [],
        "constraints": [],
        "stats": {},
        "features": {"reader": list(reader), "writer": list(writer)},
    }
    with open(os.path.join(t.log_dir, f"{v:08d}.json"), "w") as fh:
        json.dump(entry, fh)


def test_plain_table_requires_no_features(spark, tmp_path):
    t = _mk(spark, tmp_path)
    snap = t.snapshot()
    assert snap.reader_features == () and snap.writer_features == ()
    assert "features" not in t.history()[-1]


def test_dv_delete_records_reader_feature(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete(spark, "id = 1", deletion_vectors=True)
    snap = t.snapshot()
    assert "deletionVectors" in snap.reader_features
    # reader-required binds writers too (Delta invariant)
    assert "deletionVectors" in snap.writer_features
    e = t.history()[-1]
    assert e["features"]["reader"] == ["deletionVectors"]


def test_cdf_and_constraints_record_writer_features(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.alter_properties({"cdf.enabled": "true"})
    t.add_constraint(spark, "pos", "id > 0")
    snap = t.snapshot()
    assert "changeDataFeed" in snap.writer_features
    assert "checkConstraints" in snap.writer_features
    # writer-only: nothing reader-required happened
    assert snap.reader_features == ()


def test_shallow_clone_records_external_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    clone = t.clone_to(spark, str(tmp_path / "c"), shallow=True)
    snap = clone.snapshot()
    assert "externalFiles" in snap.reader_features


def test_unknown_reader_feature_refuses_reads_and_writes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _inject_feature(t, reader=["futureRowTracking"], writer=["futureRowTracking"])
    with pytest.raises(UnsupportedTableFeatureError, match="futureRowTracking"):
        t.read(spark)
    with pytest.raises(UnsupportedTableFeatureError):
        t.append(spark.createDataFrame([(3, "c")], ["id", "v"]))
    with pytest.raises(UnsupportedTableFeatureError):
        t.vacuum()  # reclaiming files it cannot interpret is unsafe too
    # the log itself stays inspectable for diagnosis
    assert t.history()[-1]["op"] == "enable_feature"


def test_unknown_writer_feature_allows_reads_refuses_writes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _inject_feature(t, writer=["futureIdentityColumns"])
    assert sorted(r["id"] for r in t.read(spark).collect()) == [1, 2]
    for attempt in (
        lambda: t.append(spark.createDataFrame([(3, "c")], ["id", "v"])),
        lambda: t.delete(spark, "id = 1"),
        lambda: t.alter_properties({"x": "y"}),
        lambda: t.add_constraint(spark, "c", "id > 0"),
        lambda: t.restore(0),
        lambda: t.compact(spark, full=True),
    ):
        with pytest.raises(UnsupportedTableFeatureError, match="writer"):
            attempt()


def test_datasource_read_gated_too(spark, tmp_path):
    """The format("txlog") reader resolves snapshots through the same
    chokepoint, so it inherits the refusal."""
    from bigdataingestion_spark.sources.txlog_datasource import register

    register(spark)
    t = _mk(spark, tmp_path)
    _inject_feature(t, reader=["futureFeature"], writer=["futureFeature"])
    with pytest.raises(Exception, match="futureFeature"):
        spark.read.format("txlog").load(t.path).collect()


def test_explicit_enable_and_unknown_refusal(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.enable_feature("changeDataFeed")
    assert "changeDataFeed" in t.snapshot().writer_features
    with pytest.raises(UnsupportedTableFeatureError, match="not implement"):
        t.enable_feature("somethingNew")
    with pytest.raises(UnsupportedTableFeatureError):
        # changeDataFeed is writer-scoped; this build has no reader impl
        t.enable_feature("changeDataFeed", reader=True)


def test_features_survive_checkpoint_roll(spark, tmp_path):
    t = _mk(spark, tmp_path, checkpoint_interval=2)
    t.delete(spark, "id = 1", deletion_vectors=True)
    for i in range(4):  # roll at least one checkpoint past the DV commit
        t.append(spark.createDataFrame([(10 + i, "x")], ["id", "v"]))
    assert any(f.endswith(".ckpt") for f in os.listdir(t.log_dir))
    fresh = TxLogTable(str(tmp_path / "t"))  # resolves via checkpoint
    assert "deletionVectors" in fresh.snapshot().reader_features


def test_features_are_monotone_across_restore(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.version()
    t.delete(spark, "id = 1", deletion_vectors=True)
    t.restore(v0)
    # restoring to a pre-DV version does not un-require the feature:
    # history still holds DV commits a reader may time-travel into
    assert "deletionVectors" in t.snapshot().reader_features


def test_metadata_only_enable_is_invisible_to_cdf(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.alter_properties({"cdf.enabled": "true"})
    v = t.enable_feature("checkConstraints")
    cdf = t.read_cdf(spark, from_version=v - 1, to_version=v)
    assert cdf.count() == 0
