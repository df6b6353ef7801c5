"""Change Data Feed (Delta's enableChangeDataFeed / table_changes):
row-level _change_type-tagged deltas per commit range. DML commits
materialize their change rows at commit time under _cdf/ (gated by the
log-carried cdf.enabled property); appends/overwrites synthesize from
the commit's own file lists."""

from __future__ import annotations

import os

import pytest

from bigdataingestion_spark.sinks.txlog import TxLogTable


def _changes(df):
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in df.collect()
    )


def _mk(spark, path, cdf=True):
    t = TxLogTable(path)
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"])
    )
    if cdf:
        t.alter_properties({"cdf.enabled": "true"})
    return t


def test_cdf_across_all_dml_classes(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))  # v0 append, v1 property
    t.delete(spark, "id = 1")  # v2 copy-on-write
    t.update(spark, "id = 2", {"v": "'B'"})  # v3
    t.merge_upsert(  # v4: update id=3, insert id=4
        spark,
        spark.createDataFrame([(3, "C"), (4, "d")], ["id", "v"]),
        keys=["id"],
    )
    t.delete(spark, "id = 4", deletion_vectors=True)  # v5 merge-on-read
    t.append(spark.createDataFrame([(9, "z")], ["id", "v"]))  # v6

    assert _changes(t.read_cdf(spark, from_version=1)) == [
        (2, "delete", 1, "a"),
        (3, "update_postimage", 2, "B"),
        (3, "update_preimage", 2, "b"),
        (4, "insert", 4, "d"),
        (4, "update_postimage", 3, "C"),
        (4, "update_preimage", 3, "c"),
        (5, "delete", 4, "d"),
        (6, "insert", 9, "z"),
    ]
    # sub-ranges slice cleanly
    assert _changes(t.read_cdf(spark, 2, 3)) == [
        (3, "update_postimage", 2, "B"),
        (3, "update_preimage", 2, "b"),
    ]
    # the pre-enablement append synthesizes from its add list
    assert t.read_cdf(spark, -1, 0).count() == 3


def test_cdf_overwrite_synthesis_respects_prior_dv(spark, tmp_path):
    """An overwrite's removed files are read under the PRE-commit mask:
    rows a deletion vector already removed must not reappear as CDF
    deletes."""
    t = _mk(spark, str(tmp_path / "t"))
    t.delete(spark, "id = 2", deletion_vectors=True)  # v2: mask (CDF delete)
    t.overwrite(spark.createDataFrame([(7, "x")], ["id", "v"]))  # v3

    got = _changes(t.read_cdf(spark, 2, 3))
    assert got == [
        (3, "delete", 1, "a"),
        (3, "delete", 3, "c"),  # id=2 was already masked: NOT re-deleted
        (3, "insert", 7, "x"),
    ]


def test_cdf_refuses_unmaterialized_dml_and_restore(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), cdf=False)
    t.delete(spark, "id = 1")  # v1, no cdf materialized
    with pytest.raises(ValueError, match="cdf.enabled"):
        t.read_cdf(spark, from_version=0)
    # ranges that avoid the unmaterialized commit still work
    assert t.read_cdf(spark, -1, 0).count() == 3

    t.restore(0)  # v2
    with pytest.raises(ValueError, match="restore"):
        t.read_cdf(spark, 1, 2)


def test_cdf_latest_wins_merge_stale_source(spark, tmp_path):
    """Latest-wins: a stale source row loses — the matched key appears
    with IDENTICAL pre/postimage (no logical change), the fresh key
    upserts normally."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(
        spark.createDataFrame(
            [(1, "new", 100), (2, "old", 10)], ["id", "v", "ts"]
        )
    )
    t.alter_properties({"cdf.enabled": "true"})
    t.merge_upsert(
        spark,
        spark.createDataFrame(
            [(1, "stale", 5), (2, "fresh", 50)], ["id", "v", "ts"]
        ),
        keys=["id"],
        order_cols=["ts"],
    )
    got = sorted(
        (r["_change_type"], r["id"], r["v"])
        for r in t.read_cdf(spark, 1).collect()
    )
    assert got == [
        ("update_postimage", 1, "new"),  # stale source lost: post == pre
        ("update_postimage", 2, "fresh"),
        ("update_preimage", 1, "new"),
        ("update_preimage", 2, "old"),
    ]


def test_cdf_files_cleaned_on_conflict_and_vacuumed_after_retention(
    spark, tmp_path, monkeypatch
):
    from bigdataingestion_spark.sinks.txlog import ConcurrentWriteError

    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(  # ONE file so both deletes must rewrite the same file
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], ["id", "v"]
        ).coalesce(1)
    )
    t.alter_properties({"cdf.enabled": "true"})
    t2 = TxLogTable(path)

    # force a TERMINAL conflict: two deletes rewriting the same file
    real_stage = TxLogTable._stage_files
    fired = []

    def stage_then_race(self, df, partition_cols=None, **kw):
        out = real_stage(self, df, partition_cols, **kw)
        if not fired:
            fired.append(True)
            t2.delete(spark, "id = 2")
        return out

    monkeypatch.setattr(TxLogTable, "_stage_files", stage_then_race)
    with pytest.raises(ConcurrentWriteError):
        t.delete(spark, "id = 1")
    monkeypatch.undo()
    # the loser's staged CDF files were reclaimed with its data files
    live_cdf = set()
    cdf_dir = os.path.join(path, "_cdf")
    if os.path.isdir(cdf_dir):
        live_cdf = set(os.listdir(cdf_dir))
    referenced = {
        os.path.basename(p)
        for e in t.history()
        for paths in (e.get("cdf") or {}).values()
        for p in paths
    }
    assert live_cdf == referenced

    # vacuum: CDF files inside retention survive, aged ones reclaimed
    assert all(not f.startswith("_cdf") for f in t.vacuum())
    for f in list(live_cdf):
        os.utime(os.path.join(cdf_dir, f), (1, 1))
    gone = t.vacuum(retention_seconds=60.0)
    assert {os.path.basename(g) for g in gone} >= live_cdf
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.read_cdf(spark, 1).collect()


def test_streaming_cdf_source_end_to_end(spark, tmp_path):
    """readStream.format('txlog').option('readChangeFeed','true'): the
    stream delivers exactly the native read_cdf rows, incrementally
    across restarts (commit versions are the offsets)."""
    from bigdataingestion_spark.sources import txlog_datasource

    txlog_datasource.register(spark)
    path = str(tmp_path / "t")
    t = _mk(spark, path)  # v0 append, v1 property
    t.delete(spark, "id = 1")  # v2
    t.update(spark, "id = 2", {"v": "'B'"})  # v3

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_batch():
        q = (
            spark.readStream.format("txlog")
            .option("readChangeFeed", "true")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_batch()
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in t.read_cdf(spark, from_version=-1).collect()
    )
    assert got == want and len(got) == 6  # 3 inserts + delete + pre/post

    # restart after more commits: only the NEW changes are appended
    t.merge_upsert(
        spark, spark.createDataFrame([(8, "h")], ["id", "v"]), keys=["id"]
    )  # v4: pure insert
    run_batch()
    got2 = sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in spark.read.parquet(out).collect()
    )
    assert len(got2) == 7
    assert (4, "insert", 8, "h") in got2


def test_streaming_cdf_refuses_unmaterialized_dml(spark, tmp_path):
    from pyspark.sql.streaming import StreamingQueryException

    from bigdataingestion_spark.sources import txlog_datasource

    txlog_datasource.register(spark)
    path = str(tmp_path / "t")
    t = _mk(spark, path, cdf=False)
    t.delete(spark, "id = 1")  # no change data materialized
    q = (
        spark.readStream.format("txlog")
        .option("readChangeFeed", "true")
        .load(path)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="cdf.enabled"):
        q.awaitTermination(180)


def test_batch_datasource_serves_read_change_feed(spark, tmp_path):
    """Formerly a documented refusal; round 7 added the batch CDF reader
    (Delta's table_changes surface) — deep coverage lives in
    test_txlog_datasource_cdf_batch.py, this pins the entry point."""
    from bigdataingestion_spark.sources import txlog_datasource

    txlog_datasource.register(spark)
    path = str(tmp_path / "t")
    t = _mk(spark, path)
    t.delete(spark, "id = 2")
    got = (
        spark.read.format("txlog")
        .option("readChangeFeed", "true")
        .option("startingVersion", t.version())
        .load(path)
        .collect()
    )
    assert [(r["_change_type"], r["id"]) for r in got] == [("delete", 2)]


def test_delete_matching_removes_by_key_set(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    for lo in (0, 10, 20):  # three files, disjoint key ranges
        t.append(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(3)], ["id", "v"]
            ).coalesce(1)
        )
    v = t.delete_matching(
        spark,
        spark.createDataFrame([(11,), (12,), (99,)], ["id"]),  # 99 absent
        keys=["id"],
    )
    assert v == 3
    m = t.history()[-1]["op_metrics"]
    # stats exclude the [0,2] file; only the [10,12] file actually holds
    # matching keys and is rewritten
    assert m["files_rewritten"] == 1 and m["files_stat_skipped"] >= 1
    assert sorted(r.id for r in t.read(spark).collect()) == [0, 1, 2, 10, 20, 21, 22]
    # absent keys + NULL keys are no-ops (no commit without a match)
    assert (
        t.delete_matching(
            spark, spark.createDataFrame([(None,)], "id int"), keys=["id"]
        )
        == 3
    )
    # replay no-ops
    assert (
        t.delete_matching(
            spark,
            spark.createDataFrame([(10,)], ["id"]),
            keys=["id"],
            txn_id="x",
        )
        == 4
    )
    assert (
        t.delete_matching(
            spark,
            spark.createDataFrame([(20,)], ["id"]),
            keys=["id"],
            txn_id="x",
        )
        == 4
    )


def test_stream_cdf_replicate_converges_with_deletes(spark, tmp_path):
    """The flagship CDC pipeline: a replica follows the source's change
    feed and converges to the source snapshot after every drained batch
    — upserts AND deletes, across both physical delete modes and an
    overwrite, exactly-once under replay."""
    from bigdataingestion_spark.streaming.ingest import stream_cdf_replicate

    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")

    src = TxLogTable(src_path)
    src.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], ["id", "v"]
        )
    )
    src.alter_properties({"cdf.enabled": "true"})
    src.delete(spark, "id = 3")  # CoW delete
    src.update(spark, "id = 4", {"v": "'UP'"})
    src.merge_upsert(
        spark,
        spark.createDataFrame([(5, "M"), (100, "new")], ["id", "v"]),
        keys=["id"],
    )
    src.delete(spark, "id = 6", deletion_vectors=True)  # merge-on-read

    def sync():
        q = stream_cdf_replicate(
            spark, src_path, dst_path, ck, keys=["id"]
        )
        assert q.awaitTermination(240), "replication batch timed out"

    def snap_rows(t):
        return sorted((r.id, r.v) for r in t.read(spark).collect())

    sync()
    dst = TxLogTable(dst_path)
    assert snap_rows(dst) == snap_rows(src)

    # more churn incl. an overwrite (same-version delete+insert of
    # overlapping keys) — the replica must still converge
    src.overwrite(
        spark.createDataFrame([(0, "OW"), (200, "x")], ["id", "v"])
    )
    src.delete(spark, "id = 200")
    sync()
    assert snap_rows(dst) == snap_rows(src) == [(0, "OW")]

    # idle re-run: nothing new, replica unchanged, no extra commits
    before = dst.version()
    sync()
    assert dst.version() == before


def test_stream_cdf_replicate_key_mutating_update_and_duplicates(
    spark, tmp_path
):
    """Two divergence traps: a source UPDATE that rewrites a KEY column
    must delete the old key on the replica (its preimage key vanishes
    from the postimage set), and a source that legitimately holds
    duplicate keys (plain appends never merge) must keep its
    multiplicity on the replica (inserts APPEND, not upsert)."""
    from bigdataingestion_spark.streaming.ingest import stream_cdf_replicate

    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")

    src = TxLogTable(src_path)
    src.append(spark.createDataFrame([(4, "d"), (7, "g")], ["id", "v"]))
    src.alter_properties({"cdf.enabled": "true"})
    src.update(spark, "id = 4", {"id": "999"})  # KEY-mutating update
    src.append(spark.createDataFrame([(7, "g2")], ["id", "v"]))  # dup key

    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    dst = TxLogTable(dst_path)
    want = sorted((r.id, r.v) for r in src.read(spark).collect())
    got = sorted((r.id, r.v) for r in dst.read(spark).collect())
    assert got == want == [(7, "g"), (7, "g2"), (999, "d")]


def test_stream_cdf_replicate_bootstrap_skips_vacuumed_history(
    spark, tmp_path
):
    """A NEW replica of a table whose early history was vacuumed cannot
    replay from v0; bootstrap=True copies the current snapshot and
    follows the feed from there."""
    from bigdataingestion_spark.streaming.ingest import stream_cdf_replicate

    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")

    src = TxLogTable(src_path)
    src.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    src.alter_properties({"cdf.enabled": "true"})
    src.overwrite(spark.createDataFrame([(3, "c")], ["id", "v"]))
    src.vacuum(retention_seconds=0.0)  # v0's files are GONE

    q = stream_cdf_replicate(
        spark, src_path, dst_path, ck, keys=["id"], bootstrap=True
    )
    assert q.awaitTermination(240)
    dst = TxLogTable(dst_path)
    assert sorted((r.id, r.v) for r in dst.read(spark).collect()) == [(3, "c")]

    # the feed continues from the bootstrap point
    src.append(spark.createDataFrame([(9, "z")], ["id", "v"]))
    q = stream_cdf_replicate(
        spark, src_path, dst_path, ck, keys=["id"], bootstrap=True
    )  # bootstrap re-run: overwrite replays as txn no-op, feed advances
    assert q.awaitTermination(240)
    assert sorted((r.id, r.v) for r in dst.read(spark).collect()) == [
        (3, "c"),
        (9, "z"),
    ]
