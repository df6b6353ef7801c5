"""Deletion vectors (merge-on-read DELETE), the Delta feature that makes
a 3-row delete in a 1 GB file cost one tiny mask file instead of a 1 GB
rewrite: commit-carried row-position runs applied by every reader,
materialized (and retired) by the next copy-on-write touch or OPTIMIZE,
versioned like any other table state."""

from __future__ import annotations

import os

import pytest

from bigdataingestion_spark.sinks.txlog import (
    ConcurrentWriteError,
    TxLogTable,
)


def _ids(df):
    return sorted(r.id for r in df.collect())


def _seed(spark, path, two_files=True):
    t = TxLogTable(path)
    t.append(
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], ["id", "v"]).coalesce(1)
    )
    if two_files:
        t.append(
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(10, 20)], ["id", "v"]
            ).coalesce(1)
        )
    return t


def test_dv_delete_masks_without_rewriting(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    before = set(t.snapshot().files)
    t.delete(spark, "id IN (3, 4, 12)", deletion_vectors=True)
    snap = t.snapshot()
    assert set(snap.files) == before  # ZERO data files rewritten
    assert len(snap.dvs) == 2  # one mask per touched file
    assert _ids(t.read(spark)) == [i for i in range(20) if i not in (3, 4, 12)]
    m = t.history()[-1]["op_metrics"]
    assert m["files_rewritten"] == 0
    assert m["files_masked"] == 2 and m["rows_masked_total"] == 3
    # time travel to before the delete still sees every row
    assert _ids(t.read(spark, version=1)) == list(range(20))


def test_dv_layering_merges_masks(spark, tmp_path):
    """A second DV delete on an already-masked file replaces the mask with
    old ∪ new positions — the scan it reads from already hides the old
    rows, so re-found positions are only the still-visible ones."""
    t = _seed(spark, str(tmp_path / "t"), two_files=False)
    t.delete(spark, "id < 3", deletion_vectors=True)
    t.delete(spark, "id IN (5, 6)", deletion_vectors=True)
    snap = t.snapshot()
    assert len(snap.files) == 1 and len(snap.dvs) == 1
    assert _ids(t.read(spark)) == [3, 4, 7, 8, 9]
    # runs cover 0,1,2 and 5,6 -> two runs after RLE
    (dv_rel,) = snap.dvs.values()
    runs = t._load_dv_runs(dv_rel)
    assert runs == [(0, 3), (5, 2)]
    # intermediate version shows only the first mask
    assert _ids(t.read(spark, version=1)) == [3, 4, 5, 6, 7, 8, 9]


def test_copy_on_write_materializes_and_retires_dv(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), two_files=False)
    t.delete(spark, "id = 2", deletion_vectors=True)
    # a copy-on-write UPDATE on the masked file rewrites it minus the
    # masked row and drops the DV from the snapshot
    t.update(spark, "id = 7", {"v": "'ZZ'"})
    snap = t.snapshot()
    assert snap.dvs == {}
    got = {r.id: r.v for r in t.read(spark).collect()}
    assert 2 not in got and got[7] == "ZZ" and len(got) == 9


def test_compact_purges_dvs_regardless_of_file_size(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"))
    t.delete(spark, "id = 12", deletion_vectors=True)
    # the masked file is above any plausible "small" cutoff for this
    # test: DV'd files are ALWAYS candidates (Delta's OPTIMIZE purge)
    v = t.compact(spark, min_file_bytes=1)  # nothing is "small"...
    assert v == t.version()
    snap = t.snapshot()
    assert snap.dvs == {}  # ...but the DV'd file was still rewritten
    assert _ids(t.read(spark)) == [i for i in range(20) if i != 12]


def test_vacuum_keeps_live_dv_reclaims_superseded(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _seed(spark, path, two_files=False)
    t.delete(spark, "id = 1", deletion_vectors=True)
    old_dv = next(iter(t.snapshot().dvs.values()))
    t.delete(spark, "id = 2", deletion_vectors=True)  # supersedes old mask
    new_dv = next(iter(t.snapshot().dvs.values()))
    assert old_dv != new_dv

    assert t.vacuum() == []  # inside retention: everything kept
    gone = t.vacuum(retention_seconds=0.0)
    # retention 0 preserves nothing-younger-than-now EXCEPT it still
    # keeps the referenced DV; the superseded one is reclaimed
    assert old_dv in gone and new_dv not in gone
    assert os.path.exists(os.path.join(path, new_dv))
    assert _ids(t.read(spark)) == [0, 3, 4, 5, 6, 7, 8, 9]


def test_restore_reinstates_dv_state(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), two_files=False)
    t.delete(spark, "id = 1", deletion_vectors=True)  # v1: mask {1}
    t.delete(spark, "id = 2", deletion_vectors=True)  # v2: mask {1,2}
    t.restore(1)
    assert _ids(t.read(spark)) == [0, 2, 3, 4, 5, 6, 7, 8, 9]
    # restore to the pre-DV version clears the mask entirely
    t.restore(0)
    assert _ids(t.read(spark)) == list(range(10))
    assert t.snapshot().dvs == {}


def test_concurrent_dv_deletes_on_same_file_conflict(spark, tmp_path, monkeypatch):
    """Two DV deletes masking the SAME file: the second mask would
    REPLACE (and thereby lose) the first — must conflict, exactly like a
    rewrite-rewrite race."""
    path = str(tmp_path / "t")
    t = _seed(spark, path, two_files=False)

    real_write = TxLogTable._write_dv
    fired = []

    def write_then_race(self, runs):
        out = real_write(self, runs)
        if not fired:
            fired.append(True)
            TxLogTable(path).delete(spark, "id = 8", deletion_vectors=True)
        return out

    monkeypatch.setattr(TxLogTable, "_write_dv", write_then_race)
    with pytest.raises(ConcurrentWriteError, match="rewrote or masked"):
        t.delete(spark, "id = 1", deletion_vectors=True)
    monkeypatch.undo()
    # the winner's mask stands; the loser's staged DV file was cleaned up
    assert _ids(t.read(spark)) == [0, 1, 2, 3, 4, 5, 6, 7, 9]
    live_dvs = {f for f in os.listdir(path) if f.startswith("dv-")}
    assert live_dvs == set(t.snapshot().dvs.values())
    # redo on the fresh snapshot masks both
    t.delete(spark, "id = 1", deletion_vectors=True)
    assert _ids(t.read(spark)) == [0, 2, 3, 4, 5, 6, 7, 9]


def test_dv_delete_reconciles_over_disjoint_file_delete(spark, tmp_path, monkeypatch):
    """A DV delete racing a copy-on-write delete of a DIFFERENT file
    reconciles: disjoint touched sets, stats-excluded winner add."""
    path = str(tmp_path / "t")
    t = _seed(spark, path)  # files [0-9] and [10-19]

    real_write = TxLogTable._write_dv
    fired = []

    def write_then_race(self, runs):
        out = real_write(self, runs)
        if not fired:
            fired.append(True)
            TxLogTable(path).delete(spark, "id = 15")  # rewrites file 2
        return out

    monkeypatch.setattr(TxLogTable, "_write_dv", write_then_race)
    v = t.delete(spark, "id = 1", deletion_vectors=True)
    monkeypatch.undo()
    assert v == t.version()
    assert _ids(t.read(spark)) == [i for i in range(20) if i not in (1, 15)]


def test_read_changes_refuses_dv_commit(spark, tmp_path):
    t = _seed(spark, str(tmp_path / "t"), two_files=False)
    t.delete(spark, "id = 1", deletion_vectors=True)
    with pytest.raises(ValueError, match="rewrites data"):
        t.read_changes(spark, from_version=-1)
    # allow_rewrites: at-least-once — adds only, so just the seed rows
    assert t.read_changes(spark, from_version=-1, allow_rewrites=True).count() == 10


def test_datasource_batch_read_applies_dvs(spark, tmp_path):
    from bigdataingestion_spark.sources import txlog_datasource

    txlog_datasource.register(spark)
    path = str(tmp_path / "t")
    t = _seed(spark, path)
    t.delete(spark, "id IN (0, 1, 2, 13)", deletion_vectors=True)
    got = sorted(
        r.id for r in spark.read.format("txlog").load(path).collect()
    )
    assert got == [i for i in range(20) if i not in (0, 1, 2, 13)]
    # time travel through the data source: pre-delete version unmasked
    got1 = spark.read.format("txlog").option("version", "1").load(path)
    assert got1.count() == 20


def test_datasource_stream_refuses_dv_commit(spark, tmp_path):
    from pyspark.sql.streaming import StreamingQueryException

    from bigdataingestion_spark.sources import txlog_datasource

    txlog_datasource.register(spark)
    path = str(tmp_path / "t")
    t = _seed(spark, path, two_files=False)
    t.delete(spark, "id = 1", deletion_vectors=True)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("txlog")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="rewrite"):
        q.awaitTermination(120)


def test_wide_dv_delete_runs_built_executor_side(spark, tmp_path):
    """Wide-delete regression for the executor-side RLE path: a delete
    matching thousands of scattered + clustered rows must produce exactly
    the runs the reference Python encoder produces, and the replaced-mask
    merge must stay run-based (old ∪ new), never re-expanding positions."""
    t = TxLogTable(str(tmp_path / "t"))
    n = 5000
    t.append(
        spark.range(n).selectExpr("id", "cast(id % 7 as long) as m").coalesce(1)
    )
    # scattered (every 3rd row) AND one dense range -> mixed run shapes
    t.delete(spark, f"id % 3 = 0 OR (id >= 1000 AND id < 1200)", deletion_vectors=True)
    snap = t.snapshot()
    assert len(snap.dvs) == 1
    dv_rel = next(iter(snap.dvs.values()))
    got_runs = t._load_dv_runs(dv_rel)
    expected_pos = [
        i for i in range(n) if i % 3 == 0 or (1000 <= i < 1200)
    ]
    assert got_runs == t._runs_from_positions(expected_pos)
    assert _ids(t.read(spark)) == [i for i in range(n) if i not in set(expected_pos)]
    m = t.history()[-1]["op_metrics"]
    assert m["rows_masked_total"] == len(expected_pos)

    # layer a second DV delete on the same file: mask becomes old ∪ new
    t.delete(spark, "id % 5 = 1 AND id % 3 != 0", deletion_vectors=True)
    snap2 = t.snapshot()
    union_pos = set(expected_pos) | {
        i
        for i in range(n)
        if i % 5 == 1 and i % 3 != 0 and not (1000 <= i < 1200)
    }
    got2 = t._load_dv_runs(next(iter(snap2.dvs.values())))
    assert got2 == t._runs_from_positions(sorted(union_pos))
    assert _ids(t.read(spark)) == [i for i in range(n) if i not in union_pos]


def test_rle_df_and_merge_runs_match_reference_encoder(spark):
    """The executor-side gaps-and-islands RLE and the run-merge must
    agree with the reference driver-side encoder on adversarial position
    sets."""
    import random

    rng = random.Random(7)
    cases = [
        [0],
        [5, 6, 7],
        [0, 2, 4, 6],
        list(range(100)),
        sorted(rng.sample(range(300), 120)),
        [1, 1, 2, 2, 3, 10, 10],  # duplicates collapse
    ]
    df = spark.createDataFrame(
        [(str(i), int(x)) for i, ps in enumerate(cases) for x in ps],
        "f string, p bigint",
    )
    rows: dict = {}
    for fname, s, c in TxLogTable._rle_runs_df(df, "f", "p").toPandas().itertuples(
        index=False
    ):
        rows.setdefault(fname, []).append((int(s), int(c)))
    for i, ps in enumerate(cases):
        assert sorted(rows[str(i)]) == TxLogTable._runs_from_positions(
            ps
        ), f"case {i}"

    # run-merge == expand-positions-and-re-encode, including overlaps
    for _ in range(25):
        a = TxLogTable._runs_from_positions(rng.sample(range(200), rng.randint(0, 40)))
        b = TxLogTable._runs_from_positions(rng.sample(range(200), rng.randint(0, 40)))
        expand = lambda runs: [p for s, c in runs for p in range(s, s + c)]
        assert TxLogTable._merge_runs(a, b) == TxLogTable._runs_from_positions(
            expand(a) + expand(b)
        )


def test_wide_mask_read_uses_searchsorted_path(spark, tmp_path):
    """Above 4096 total runs the DV read switches from the JVM anti-join
    to the vectorized searchsorted filter — results must be identical,
    including layering and time travel."""
    t = TxLogTable(str(tmp_path / "t"))
    n = 20_000
    t.append(spark.range(n).selectExpr("id", "id % 2 as par").coalesce(2))
    t.delete(spark, "par = 0", deletion_vectors=True)  # ~10k runs: wide
    snap = t.snapshot()
    assert sum(len(t._load_dv_runs(d)) for d in snap.dvs.values()) > 4096
    assert t.read(spark).count() == n // 2
    assert _ids(t.read(spark)) == [i for i in range(n) if i % 2 == 1]
    # layering on the wide mask still converges
    t.delete(spark, "id = 1", deletion_vectors=True)
    assert t.read(spark).count() == n // 2 - 1
    # time travel to before the delete sees everything (sparse path)
    assert t.read(spark, version=0).count() == n
