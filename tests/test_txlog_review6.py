"""Regression tests for the round-6 second adversarial review: restore
race safety (historical files must survive a lost commit race),
blind-replace tolerance of concurrent masks, log-carried table
properties, DV tmp reclamation, and collision-proof helper columns."""

from __future__ import annotations

import os

import pytest

from bigdataingestion_spark.sinks.txlog import TxLogTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_restore_losing_race_preserves_history_and_retries(
    spark, tmp_path, monkeypatch
):
    """A restore's 'add' list is COMMITTED HISTORICAL files; losing the
    version race must never delete them (the old cleanup-on-conflict
    would have — unrecoverable corruption of every version referencing
    them). The restore recomputes its diff and lands."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1,)], ["id"]))
    t.overwrite(spark.createDataFrame([(2,)], ["id"]))  # v1: v0's file inactive

    real_commit = TxLogTable._commit
    fired = []

    def commit_with_interloper(self, *a, **k):
        if not fired:
            fired.append(True)
            TxLogTable(path).append(spark.createDataFrame([(9,)], ["id"]))
        return real_commit(self, *a, **k)

    monkeypatch.setattr(TxLogTable, "_commit", commit_with_interloper)
    v = t.restore(0)  # re-adds v0's historical file, races the append
    monkeypatch.undo()
    assert v == 3  # interloper v2, recomputed restore v3
    assert _rows(t.read(spark)) == [(1,)]
    # every version is still fully readable — no historical file was lost
    assert _rows(t.read(spark, version=0)) == [(1,)]
    assert _rows(t.read(spark, version=1)) == [(2,)]
    assert _rows(t.read(spark, version=2)) == [(2,), (9,)]


def test_overwrite_reconciles_over_concurrent_dv_delete(
    spark, tmp_path, monkeypatch
):
    """Blind replace vs a winner's deletion vector: the overwrite removes
    the masked file entirely (mask dies with it) — serial order holds, no
    conflict, no redone staging."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(i,) for i in range(5)], ["id"]))

    real_stage = TxLogTable._stage_files
    fired = []

    def stage_then_dv(self, df, partition_cols=None, **kw):
        out = real_stage(self, df, partition_cols, **kw)
        if not fired:
            fired.append(True)
            TxLogTable(path).delete(spark, "id = 2", deletion_vectors=True)
        return out

    monkeypatch.setattr(TxLogTable, "_stage_files", stage_then_dv)
    v = t.overwrite(spark.createDataFrame([(100,)], ["id"]))
    monkeypatch.undo()
    assert v == 2
    assert _rows(t.read(spark)) == [(100,)]
    assert t.snapshot().dvs == {}  # the mask died with the replaced file


def test_properties_bind_to_table_not_writer_instance(spark, tmp_path):
    """txn.retention.seconds set via ALTER TABLE is honored by a writer
    constructed with DEFAULTS (the format('txlog') commit-worker shape) —
    the user's exactly-once guarantee cannot be lost to an internal
    code path's constructor args."""
    path = str(tmp_path / "t")
    admin = TxLogTable(path, checkpoint_interval=100)
    admin.append(spark.createDataFrame([(0,)], ["id"]), txn_id="keep-0")
    admin.alter_properties({"txn.retention.seconds": "0"})

    # default-constructed writer (30-day constructor retention) rolls a
    # checkpoint: the table property (0 s) wins and expires old ids
    w = TxLogTable(path, checkpoint_interval=1)
    w.append(spark.createDataFrame([(1,)], ["id"]), txn_id="b-1")
    snap = TxLogTable(path).snapshot()
    assert "keep-0" not in snap.txn_ids

    # and "none" disables expiry even for a 0-retention writer instance
    admin.alter_properties({"txn.retention.seconds": "none"})
    w0 = TxLogTable(path, checkpoint_interval=1, txn_retention_seconds=0.0)
    w0.append(spark.createDataFrame([(2,)], ["id"]), txn_id="b-2")
    w0.append(spark.createDataFrame([(3,)], ["id"]), txn_id="b-3")
    snap = TxLogTable(path).snapshot()
    assert "b-2" in snap.txn_ids and "b-3" in snap.txn_ids

    with pytest.raises(ValueError, match="isolation"):
        admin.alter_properties({"isolation.level": "bogus"})


def test_isolation_property_overrides_writer_default(
    spark, tmp_path, monkeypatch
):
    """isolation.level=serializable in the LOG makes a default-isolation
    writer's DELETE conflict with a matching concurrent append."""
    from bigdataingestion_spark.sinks.txlog import ConcurrentWriteError

    path = str(tmp_path / "t")
    admin = TxLogTable(path)
    admin.append(spark.createDataFrame([(i,) for i in range(5)], ["id"]))
    admin.alter_properties({"isolation.level": "serializable"})

    t = TxLogTable(path)  # default write_serializable instance
    real_stage = TxLogTable._stage_files
    fired = []

    def stage_then_append(self, df, partition_cols=None, **kw):
        out = real_stage(self, df, partition_cols, **kw)
        if not fired:
            fired.append(True)
            TxLogTable(path).append(spark.createDataFrame([(3,)], ["id"]))
        return out

    monkeypatch.setattr(TxLogTable, "_stage_files", stage_then_append)
    with pytest.raises(ConcurrentWriteError, match="read set"):
        t.delete(spark, "id < 5")


def test_property_change_conflicts_with_inflight_op(spark, tmp_path, monkeypatch):
    from bigdataingestion_spark.sinks.txlog import ConcurrentWriteError

    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1,)], ["id"]))

    real_stage = TxLogTable._stage_files
    fired = []

    def stage_then_alter(self, df, partition_cols=None, **kw):
        out = real_stage(self, df, partition_cols, **kw)
        if not fired:
            fired.append(True)
            TxLogTable(path).alter_properties({"isolation.level": "serializable"})
        return out

    monkeypatch.setattr(TxLogTable, "_stage_files", stage_then_alter)
    with pytest.raises(ConcurrentWriteError, match="properties"):
        t.append(spark.createDataFrame([(2,)], ["id"]))
    monkeypatch.undo()
    assert t.snapshot().properties == {"isolation.level": "serializable"}


def test_vacuum_reclaims_orphaned_dv_tmp(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1,)], ["id"]))
    orphan = os.path.join(path, "dv-deadbeef.json.tmp")
    with open(orphan, "w") as fh:
        fh.write("{}")
    os.utime(orphan, (1, 1))  # ancient: outside any retention window
    gone = t.vacuum(retention_seconds=60.0)
    assert "dv-deadbeef.json.tmp" in gone
    assert not os.path.exists(orphan)


def test_dv_filter_survives_user_column_named_like_helpers(spark, tmp_path):
    """A table whose schema contains _dv_file / _file must not lose those
    columns (or mis-key the mask join) under a DV delete."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(
        spark.createDataFrame(
            [(i, f"u{i}", f"w{i}") for i in range(6)],
            ["id", "_dv_file", "_file"],
        ).coalesce(1)
    )
    t.delete(spark, "id = 2", deletion_vectors=True)
    out = t.read(spark)
    assert sorted(out.columns) == ["_dv_file", "_file", "id"]
    got = {r["id"]: (r["_dv_file"], r["_file"]) for r in out.collect()}
    assert 2 not in got and got[3] == ("u3", "w3") and len(got) == 5
    # copy-on-write DML over the same schema also keeps the columns
    t.delete(spark, "id = 4")
    out2 = t.read(spark)
    assert sorted(out2.columns) == ["_dv_file", "_file", "id"]
    assert sorted(r["id"] for r in out2.collect()) == [0, 1, 3, 5]


def test_update_evaluates_all_sets_against_preimage(spark, tmp_path):
    """SQL UPDATE semantics: predicate AND every SET expression see the
    row's ORIGINAL values — SET a=b, b=a swaps, and a SET that changes a
    predicate column cannot hide the row from other assignments."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "p", 10), (2, "q", 20)], ["id", "status", "n"]
        )
    )
    # the first assignment rewrites the predicate column; the second must
    # still fire (a sequential withColumn chain would skip it)
    t.update(spark, "status = 'p'", {"status": "'d'", "n": "n + 1"})
    got = {r["id"]: (r["status"], r["n"]) for r in t.read(spark).collect()}
    assert got == {1: ("d", 11), 2: ("q", 20)}

    # swap: both expressions read pre-image values
    t2 = TxLogTable(str(tmp_path / "t2"))
    t2.append(spark.createDataFrame([(1, "A", "B")], ["id", "a", "b"]))
    t2.update(spark, "id = 1", {"a": "b", "b": "a"})
    r = t2.read(spark).collect()[0]
    assert (r["a"], r["b"]) == ("B", "A")


def test_update_cdf_postimage_survives_predicate_column_set(spark, tmp_path):
    """CDF: a SET that changes the predicate column must still emit the
    postimage rows (filtering post-SET rows by the predicate would lose
    them all, leaving a preimage that looks like a delete)."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, "pending"), (2, "other")], ["id", "v"])
    )
    t.alter_properties({"cdf.enabled": "true"})
    t.update(spark, "v = 'pending'", {"v": "'done'"})
    got = sorted(
        (r["_change_type"], r["id"], r["v"])
        for r in t.read_cdf(spark, 1).collect()
    )
    assert got == [
        ("update_postimage", 1, "done"),
        ("update_preimage", 1, "pending"),
    ]


def test_cdf_enabled_property_normalizes_and_validates(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.alter_properties({"cdf.enabled": True})  # Python bool, not "true"
    assert t.snapshot().properties["cdf.enabled"] == "true"
    t.delete(spark, "id = 1")  # must materialize change rows
    assert t.read_cdf(spark, 1).count() == 1
    with pytest.raises(ValueError, match="cdf.enabled"):
        t.alter_properties({"cdf.enabled": "maybe"})


def test_read_cdf_overwrite_after_schema_replacement(spark, tmp_path):
    """The overwrite's removed files are read under the PRE-commit
    schema: an overwrite that replaced the schema wholesale must not make
    the synthesized delete rows unreadable."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.alter_properties({"cdf.enabled": "true"})
    t.overwrite(
        spark.createDataFrame([("one", 1.5)], ["name", "score"])
    )  # completely different schema
    rows = t.read_cdf(spark, 1).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert len(by_type["delete"]) == 1 and by_type["delete"][0]["id"] == 1
    assert len(by_type["insert"]) == 1
    assert by_type["insert"][0]["name"] == "one"
