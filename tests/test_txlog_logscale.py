"""Log-resolution scale behavior: the ``_last_checkpoint`` pointer makes
hot-path snapshot()/version() O(commits-since-checkpoint) with NO
directory listing (Delta's move — LIST over a million-entry log dir is
the scaling cliff on object stores), and checkpoint-time txn-id
retention bounds the per-micro-batch txn set a streaming table
accumulates (Delta's setTransactionRetentionDuration)."""

from __future__ import annotations

import json
import os

import pytest

from bigdataingestion_spark.sinks.txlog import TxLogTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hot_path_resolves_without_directory_listing(spark, tmp_path, monkeypatch):
    """After a checkpoint, snapshot()/version()/commits_between must not
    list the log directory at all — every file is addressed by
    constructed name. Proven by making the listing helpers explode."""
    t = TxLogTable(str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(12):  # checkpoints at v5 and v10, pointer at v10
        t.append(spark.createDataFrame([(i,)], ["id"]))
    assert os.path.exists(str(tmp_path / "t/_txlog/_last_checkpoint"))

    def boom(self):
        raise AssertionError("hot path listed the log directory")

    monkeypatch.setattr(TxLogTable, "_commit_files", boom)
    monkeypatch.setattr(TxLogTable, "_checkpoint_files", boom)
    assert t.version() == 11
    snap = t.snapshot()
    assert snap.version == 11 and len(snap.files) == 12
    assert [e["version"] for e in t.commits_between(9, 11)] == [10, 11]
    # and a WRITE on the hot path (snapshot + commit) also never lists;
    # v12 is not a checkpoint boundary so no checkpoint write either
    v = t.append(spark.createDataFrame([(99,)], ["id"]))
    assert v == 12
    monkeypatch.undo()
    assert _rows(t.read(spark)) == [(i,) for i in range(12)] + [(99,)]


def test_corrupt_or_stale_pointer_falls_back(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"), checkpoint_interval=3)
    for i in range(7):
        t.append(spark.createDataFrame([(i,)], ["id"]))
    ptr = str(tmp_path / "t/_txlog/_last_checkpoint")

    # corrupt pointer: resolution falls back to the listing, still exact
    with open(ptr, "w") as fh:
        fh.write("{not json")
    assert t.version() == 6
    assert t.snapshot().version == 6
    assert _rows(t.read(spark)) == [(i,) for i in range(7)]

    # stale-but-valid pointer (an older checkpoint): forward probing from
    # it still reaches the true latest version
    with open(ptr, "w") as fh:
        json.dump({"version": 2}, fh)
    assert t.version() == 6
    assert t.snapshot().version == 6

    # pointer to a nonexistent checkpoint: ignored
    with open(ptr, "w") as fh:
        json.dump({"version": 9999}, fh)
    assert t.version() == 6


def test_checkpoint_never_regresses_pointer(spark, tmp_path):
    """The pointer only advances: a writer checkpointing an older version
    (e.g. a laggard rebuilding a checkpoint) must not move it backwards."""
    t = TxLogTable(str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(11):
        t.append(spark.createDataFrame([(i,)], ["id"]))
    assert t._last_checkpoint_version() == 10
    t._write_checkpoint(t.snapshot(5))  # rebuild an OLD checkpoint
    assert t._last_checkpoint_version() == 10  # unchanged


def test_txn_retention_expires_old_ids_at_checkpoint(spark, tmp_path):
    """With retention 0 every id older than 'now' is dropped when a
    checkpoint rolls; ids committed after the checkpoint are still
    replay-detected. Default retention (30 days) keeps everything."""
    path = str(tmp_path / "t")
    t = TxLogTable(path, checkpoint_interval=5, txn_retention_seconds=0.0)
    for i in range(6):  # checkpoint rolls at v5, expiring b0..b5
        t.append(spark.createDataFrame([(i,)], ["id"]), txn_id=f"b{i}")
    t.append(spark.createDataFrame([(6,)], ["id"]), txn_id="b6")
    snap = t.snapshot()
    assert "b6" in snap.txn_ids  # post-checkpoint: alive in the log tail
    for old in ("b0", "b1", "b5"):
        assert old not in snap.txn_ids  # expired at the checkpoint roll

    # the documented trade-off: an expired id is no longer replay-detected
    t.append(spark.createDataFrame([(0,)], ["id"]), txn_id="b0")
    assert _rows(t.read(spark)).count((0,)) == 2

    # a live id still no-ops exactly-once
    v = t.version()
    assert t.append(spark.createDataFrame([(6,)], ["id"]), txn_id="b6") == v
    assert _rows(t.read(spark)).count((6,)) == 1

    # default retention: nothing expires across a checkpoint
    t2 = TxLogTable(str(tmp_path / "t2"), checkpoint_interval=5)
    for i in range(7):
        t2.append(spark.createDataFrame([(i,)], ["id"]), txn_id=f"c{i}")
    assert set(t2.snapshot().txn_ids) == {f"c{i}" for i in range(7)}


def test_legacy_checkpoint_without_txn_ts_never_expires(spark, tmp_path):
    """Checkpoints written before the txn_ts field exist: their ids carry
    no timestamp and must never be expired, even at retention 0."""
    path = str(tmp_path / "t")
    t = TxLogTable(path, checkpoint_interval=100)  # no auto-checkpoint
    t.append(spark.createDataFrame([(1,)], ["id"]), txn_id="legacy-1")
    # simulate a pre-upgrade checkpoint: roll one manually, strip txn_ts
    snap = t.snapshot()
    t._write_checkpoint(snap)
    ck = os.path.join(path, "_txlog", "00000000.ckpt")
    d = json.loads(open(ck).read())
    d.pop("txn_ts", None)
    with open(ck, "w") as fh:
        json.dump(d, fh)

    t3 = TxLogTable(path, checkpoint_interval=1, txn_retention_seconds=0.0)
    t3.append(spark.createDataFrame([(2,)], ["id"]))  # checkpoint rolls
    assert "legacy-1" in t3.snapshot().txn_ids
    # replay of the legacy id still no-ops
    v = t3.version()
    assert t3.append(spark.createDataFrame([(1,)], ["id"]), txn_id="legacy-1") == v
