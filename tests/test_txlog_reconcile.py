"""Commit-time LOGICAL conflict reconciliation (txlog._commit_reconciled):
Delta's ConflictChecker semantics on the minimal log. A lost version race
must not force an op to redo its staging work unless a winning commit
truly conflicts — removed a file the op rewrites, changed metadata, or
added files intersecting the op's read set (isolation-dependent). These
tests inject a competing commit deterministically between an op's
snapshot+staging and its commit, via a hook on ``_stage_files``."""

from __future__ import annotations

import os

import pytest

from bigdataingestion_spark.sinks.txlog import (
    ConcurrentWriteError,
    TxLogTable,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _interleave(monkeypatch, action):
    """Arrange for ``action()`` to run exactly once, immediately after the
    NEXT ``_stage_files`` completes — i.e. after the op under test has
    taken its snapshot and staged its files, but before its commit. The
    action's own table ops re-enter the hook; the fired flag keeps them
    un-intercepted."""
    real = TxLogTable._stage_files
    fired = []

    def hook(self, df, partition_cols=None, **kw):
        files = real(self, df, partition_cols, **kw)
        if not fired:
            fired.append(True)
            action()
        return files

    monkeypatch.setattr(TxLogTable, "_stage_files", hook)


def _assert_no_orphans(t: TxLogTable, path: str) -> None:
    """Every .parquet under the table root is referenced by SOME committed
    version (loser staging must never leak files)."""
    referenced = set()
    for ver in range(t.version() + 1):
        referenced.update(t.snapshot(ver).files)
    live = set()
    for root, _d, fs in os.walk(path):
        if "_txlog" in root or "_staging" in root:
            continue
        rel = os.path.relpath(root, path)
        for f in fs:
            if f.endswith(".parquet"):
                live.add(f if rel == "." else os.path.join(rel, f))
    assert live == referenced


def _ids(n0, n1):
    return [(i,) for i in range(n0, n1)]


def test_append_reconciles_over_concurrent_append(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(0,)], ["id"]))

    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).append(spark.createDataFrame([(1,)], ["id"])),
    )
    v = t.append(spark.createDataFrame([(2,)], ["id"]))
    assert v == 2  # serialized after the interloper, no error, no redo
    assert _rows(t.read(spark)) == [(0,), (1,), (2,)]
    _assert_no_orphans(t, path)


def test_delete_tolerates_blind_append_at_write_serializable(
    spark, tmp_path, monkeypatch
):
    """Delta's default isolation: a winner BLIND APPEND is invisible to a
    DELETE's read-set check, so a concurrently-appended row survives EVEN
    IF it matches the predicate — the documented WriteSerializable
    anomaly, accepted so steady ingest can never starve DML."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame(_ids(0, 5), ["id"]))
    t.append(spark.createDataFrame(_ids(5, 10), ["id"]))

    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).append(spark.createDataFrame([(3,)], ["id"])),
    )
    v = t.delete(spark, "id < 5")
    assert v == 3  # interloper v2, reconciled delete v3
    # original ids 0-4 gone; the concurrently appended 3 SURVIVES
    assert _rows(t.read(spark)) == [(3,)] + _ids(5, 10)
    _assert_no_orphans(t, path)


def test_delete_conflicts_with_matching_append_at_serializable(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    t = TxLogTable(path, isolation="serializable")
    t.append(spark.createDataFrame(_ids(0, 5), ["id"]))

    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).append(spark.createDataFrame([(3,)], ["id"])),
    )
    with pytest.raises(ConcurrentWriteError, match="read set"):
        t.delete(spark, "id < 5")
    # the interloper's row stands; the delete left no orphans
    assert _rows(t.read(spark)) == sorted(_ids(0, 5) + [(3,)])
    _assert_no_orphans(t, path)
    # the redo (fresh snapshot) removes both the originals and the late row
    t.delete(spark, "id < 5")
    assert _rows(t.read(spark)) == []


def test_delete_reconciles_with_stats_disjoint_append_at_serializable(
    spark, tmp_path, monkeypatch
):
    """Even under full serializable isolation, log-held stats can PROVE a
    winner add disjoint from the predicate — provably-serial schedules
    reconcile, only genuinely-intersecting ones conflict."""
    path = str(tmp_path / "t")
    t = TxLogTable(path, isolation="serializable")
    t.append(spark.createDataFrame(_ids(0, 5), ["id"]))

    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).append(
            spark.createDataFrame([(1000,)], ["id"])
        ),
    )
    v = t.delete(spark, "id < 5")
    assert v == 2
    assert _rows(t.read(spark)) == [(1000,)]
    _assert_no_orphans(t, path)


def test_delete_vs_concurrent_update_stats_decide(spark, tmp_path, monkeypatch):
    """A winner UPDATE is a non-blind add even at write_serializable: its
    rewritten file goes through the read-set check. Stats decide — a
    rewrite provably outside the predicate reconciles, one inside
    conflicts."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame(_ids(0, 5), ["id"]))  # file A: 0-4
    t.append(spark.createDataFrame(_ids(10, 15), ["id"]))  # file B: 10-14

    # case 1: update keeps file B's ids outside "id < 5" -> reconciles
    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).update(spark, "id = 12", {"id": "13"}),
    )
    v = t.delete(spark, "id < 5")
    assert v == 3
    assert _rows(t.read(spark)) == [(10,), (11,), (13,), (13,), (14,)]
    monkeypatch.undo()

    # case 2 (fresh table): update moves a row INTO the predicate range
    # -> conflict even at write_serializable (non-blind winner add)
    path2 = str(tmp_path / "t2")
    t2 = TxLogTable(path2)
    t2.append(spark.createDataFrame(_ids(0, 5), ["id"]))  # file A: 0-4
    t2.append(spark.createDataFrame(_ids(10, 15), ["id"]))  # file B: 10-14
    _interleave(
        monkeypatch,
        lambda: TxLogTable(path2).update(spark, "id = 10", {"id": "1"}),
    )
    with pytest.raises(ConcurrentWriteError, match="read set"):
        t2.delete(spark, "id < 5")
    _assert_no_orphans(t2, path2)


def test_merge_tolerates_blind_append_but_conflicts_with_nonblind(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))

    # blind append racing the merge: tolerated at write_serializable
    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).append(
            spark.createDataFrame([(9, "late")], ["id", "v"])
        ),
    )
    v = t.merge_upsert(
        spark, spark.createDataFrame([(2, "B")], ["id", "v"]), keys=["id"]
    )
    assert v == 2
    assert _rows(t.read(spark)) == [(1, "a"), (2, "B"), (9, "late")]
    monkeypatch.undo()

    # a winner MERGE whose rewrite intersects our key bounds: conflict
    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).merge_upsert(
            spark,
            spark.createDataFrame([(1, "z")], ["id", "v"]),
            keys=["id"],
        ),
    )
    with pytest.raises(ConcurrentWriteError):
        t.merge_upsert(
            spark, spark.createDataFrame([(1, "y")], ["id", "v"]), keys=["id"]
        )
    _assert_no_orphans(t, path)


def test_merge_reconciles_with_key_disjoint_nonblind_winner(
    spark, tmp_path, monkeypatch
):
    """The merge read-set check reuses the data-skipping stats: a winner
    rewrite whose key range provably misses the source's bounds
    reconciles instead of conflicting."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))  # file A
    t.append(spark.createDataFrame([(100, "x")], ["id", "v"]))  # file B

    # winner deletes in the id=100 region; our merge touches id=1 only
    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).delete(spark, "id = 100"),
    )
    v = t.merge_upsert(
        spark, spark.createDataFrame([(1, "A")], ["id", "v"]), keys=["id"]
    )
    assert v == 3
    assert _rows(t.read(spark)) == [(1, "A")]
    _assert_no_orphans(t, path)


def test_reconcile_adopts_concurrent_additive_schema(spark, tmp_path, monkeypatch):
    """A winner's additive evolution must not be regressed by the
    reconciled entry's narrower schema (the snapshot schema is the last
    entry's): the re-commit merges schemas, and the new column survives."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))

    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).append(
            spark.createDataFrame([(3, "c", 7.5)], ["id", "v", "score"])
        ),
    )
    t.delete(spark, "id = 1")
    out = t.read(spark)
    assert [f.name for f in out.schema.fields] == ["id", "v", "score"]
    got = {r["id"]: r["score"] for r in out.collect()}
    assert got == {2: None, 3: 7.5}
    _assert_no_orphans(t, path)


def test_reconcile_conflicts_on_concurrent_constraint_add(
    spark, tmp_path, monkeypatch
):
    """An append validated against the BASE constraint set cannot land
    after a concurrent ADD CONSTRAINT — its rows were never checked
    against the new rule."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1,)], ["id"]))

    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).add_constraint(spark, "pos", "id > 0"),
    )
    with pytest.raises(ConcurrentWriteError, match="constraints"):
        t.append(spark.createDataFrame([(-5,)], ["id"]))
    assert _rows(t.read(spark)) == [(1,)]
    _assert_no_orphans(t, path)


def test_compact_adopts_concurrent_constraint_add(spark, tmp_path, monkeypatch):
    """Compaction is content-preserving — every row it rewrites was
    validated (as table content) by the winning ADD CONSTRAINT itself —
    so it adopts the new constraint set instead of conflicting, and the
    constraint survives in the reconciled entry."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    for i in range(3):
        t.append(spark.createDataFrame([(i + 1,)], ["id"]))

    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).add_constraint(spark, "pos", "id > 0"),
    )
    v = t.compact(spark)
    assert v == 4
    assert t.snapshot().constraints == (("pos", "id > 0"),)
    # the adopted constraint is enforced on the next write
    from bigdataingestion_spark.sinks.txlog import ConstraintViolationError

    with pytest.raises(ConstraintViolationError):
        t.append(spark.createDataFrame([(-1,)], ["id"]))
    assert _rows(t.read(spark)) == [(1,), (2,), (3,)]


def test_txn_replay_detected_during_reconcile(spark, tmp_path, monkeypatch):
    """Exactly-once under a race on the SAME txn id: if the competing
    writer lands our txn id first, the reconcile path detects the replay,
    discards the staged duplicate files, and returns the winner's
    version."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(0,)], ["id"]))
    df = spark.createDataFrame([(7,)], ["id"])

    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).append(
            spark.createDataFrame([(7,)], ["id"]), txn_id="batch-42"
        ),
    )
    v = t.append(df, txn_id="batch-42")
    assert v == 1 == t.version()  # winner's version; no new commit
    assert _rows(t.read(spark)) == [(0,), (7,)]  # exactly once
    _assert_no_orphans(t, path)


def test_overwrite_partitions_reconciles_over_untouched_partition_append(
    spark, tmp_path, monkeypatch
):
    """Dynamic-partition overwrite racing a write to a DIFFERENT
    partition: the remove set is recomputed at commit time, so the other
    partition's new file survives and only the touched partition is
    replaced."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.overwrite_partitions(
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "part"]),
        partition_cols=["part"],
    )

    _interleave(
        monkeypatch,
        lambda: TxLogTable(path).overwrite_partitions(
            spark.createDataFrame([(20, "b")], ["id", "part"]),
            partition_cols=["part"],
        ),
    )
    v = t.overwrite_partitions(
        spark.createDataFrame([(10, "a")], ["id", "part"]),
        partition_cols=["part"],
    )
    assert v == 2
    # partition a replaced by ours, partition b replaced by the winner
    assert _rows(t.read(spark).select("id", "part")) == [
        (10, "a"),
        (20, "b"),
    ]
    _assert_no_orphans(t, path)
