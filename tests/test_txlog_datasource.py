"""format("txlog") Python Data Source (sources/txlog_datasource.py):
batch read with time travel and partition handling, the version-offset
Structured Streaming source, and the Arrow-staged exactly-once writers —
the Delta-parity surface expressed through Spark's own reader/writer
chains instead of the programmatic TxLogTable API."""

from __future__ import annotations

import os
import time

import pytest

from bigdataingestion_spark.sinks.txlog import TxLogTable
from bigdataingestion_spark.sources.txlog_datasource import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _drain(stream_df, out_dir, ckpt_dir, fmt="parquet"):
    q = (
        stream_df.writeStream.format(fmt)
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"


# ----------------------------------------------------------- batch read --


def test_batch_read_matches_native_and_time_travels(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    before = time.time()
    t.append(spark.createDataFrame([(3, "c")], ["id", "v"]))

    df = spark.read.format("txlog").load(path)
    assert _rows(df) == _rows(t.read(spark))
    assert df.schema == t.read(spark).schema
    # version and timestamp time travel through reader options
    assert _rows(spark.read.format("txlog").option("version", 0).load(path)) == [
        (1, "a"),
        (2, "b"),
    ]
    assert _rows(
        spark.read.format("txlog").option("timestamp", before).load(path)
    ) == [(1, "a"), (2, "b")]


def test_batch_read_fills_pre_evolution_files_with_nulls(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.append(
        spark.createDataFrame([(2, "b", "x")], ["id", "v", "extra"])
    )  # additive evolution: older file lacks `extra`
    assert _rows(spark.read.format("txlog").load(path)) == [
        (1, "a", None),
        (2, "b", "x"),
    ]


def test_partitioned_read_and_partition_filter_prune(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.overwrite_partitions(
        spark.createDataFrame(
            [(1, "us", 5), (2, "de", 6), (3, "us", 7)], ["id", "cc", "x"]
        ),
        ["cc"],
    )
    full = spark.read.format("txlog").load(path)
    assert _rows(full) == [(1, "us", 5), (2, "de", 6), (3, "us", 7)]
    pruned = (
        spark.read.format("txlog")
        .option("partitionFilter", "cc=us")
        .load(path)
    )
    assert _rows(pruned) == [(1, "us", 5), (3, "us", 7)]
    with pytest.raises(Exception, match="not a partition column"):
        spark.read.format("txlog").option(
            "partitionFilter", "nope=1"
        ).load(path).collect()


def test_relation_reuse_unfiltered_after_filtered_is_not_pruned(spark, tmp_path):
    """Regression guard for the Spark 4.1 scan-caching hazard that made us
    drop pushFilters(): on ONE loaded relation, a filtered collect
    followed by an unfiltered collect must return the full table."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "v"]))
    df = spark.read.format("txlog").load(path)
    assert _rows(df.filter("id > 1")) == [(2, "b"), (3, "c")]
    assert _rows(df) == [(1, "a"), (2, "b"), (3, "c")]  # must NOT be pruned


# ---------------------------------------------------------- stream read --


def test_stream_read_delivers_history_then_only_deltas(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
    t.compact(spark)  # layout-only commit: transparent to the stream
    t.add_constraint(spark, "id_pos", "id > 0")  # metadata-only commit

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark.readStream.format("txlog").load(path), out, ckpt)
    assert _rows(spark.read.parquet(out)) == [(1, "a"), (2, "b")]

    # restart after the source advanced: only the delta arrives
    t.append(spark.createDataFrame([(3, "c")], ["id", "v"]))
    _drain(spark.readStream.format("txlog").load(path), out, ckpt)
    assert _rows(spark.read.parquet(out)) == [(1, "a"), (2, "b"), (3, "c")]


def test_stream_read_survives_metadata_only_batches(spark, tmp_path):
    """A version range holding only metadata commits (constraints,
    compactions) plans a zero-partition micro-batch — the stream must
    drain cleanly, deliver nothing, and keep its offsets advancing."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark.readStream.format("txlog").load(path), out, ckpt)
    t.add_constraint(spark, "id_pos", "id > 0")
    t.compact(spark)
    _drain(spark.readStream.format("txlog").load(path), out, ckpt)
    assert _rows(spark.read.parquet(out)) == [(1, "a")]


def test_stream_read_starting_version_skips_history(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(
        spark.readStream.format("txlog")
        .option("startingVersion", 1)
        .load(path),
        out,
        ckpt,
    )
    assert _rows(spark.read.parquet(out)) == [(2, "b")]


def test_stream_read_refuses_rewrites_unless_opted_in(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).coalesce(1)
    )
    t.delete(spark, "id = 1")  # copy-on-write rewrite commit
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="rewrite|STREAM_FAILED"):
        _drain(spark.readStream.format("txlog").load(path), out, ckpt)
    # opt-in: at-least-once — the rewritten file's rows are delivered
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    _drain(
        spark.readStream.format("txlog")
        .option("allowRewrites", "true")
        .load(path),
        out2,
        ckpt2,
    )
    assert _rows(spark.read.parquet(out2)) == [(1, "a"), (2, "b"), (2, "b")]


def test_rich_types_roundtrip_both_directions(spark, tmp_path):
    """Arrays, structs, maps, binary, decimals, dates and timestamps must
    survive the Arrow boundary in both the reader and the writer — the
    embedding (array<float>) and multimodal (binary) columns depend on
    it."""
    import datetime
    from decimal import Decimal

    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(
                i=1,
                d=1.5,
                s="a",
                b=True,
                dt=datetime.date(2024, 1, 1),
                ts=datetime.datetime(2024, 1, 1, 12, 0, 0),
                arr=[1.0, 2.0],
                st=Row(x=1, y="u"),
                mp={"k": 2},
                byt=bytearray(b"\x01\x02"),
                dec=Decimal("12.34"),
            )
        ],
        schema=(
            "i long, d double, s string, b boolean, dt date, ts timestamp,"
            " arr array<float>, st struct<x:int,y:string>,"
            " mp map<string,int>, byt binary, dec decimal(10,2)"
        ),
    )
    native_path = str(tmp_path / "native")
    t = TxLogTable(native_path)
    t.append(df)
    via_ds = spark.read.format("txlog").load(native_path)
    assert via_ds.schema == t.read(spark).schema
    assert via_ds.collect() == t.read(spark).collect()

    ds_path = str(tmp_path / "ds")
    df.write.format("txlog").mode("append").save(ds_path)
    back = TxLogTable(ds_path).read(spark)
    assert back.schema == df.schema
    assert back.collect() == df.collect()


def test_max_versions_per_batch_is_refused(spark, tmp_path):
    """A per-batch offset cap cannot be made monotonic under Spark's
    multi-instance use of DataSourceStreamReader (a second instance's
    lower offset makes Spark replay the overlap — duplicates), so the
    option must refuse loudly instead of dropping or duplicating data."""
    path = str(tmp_path / "t")
    TxLogTable(path).append(spark.createDataFrame([(1,)], ["id"]))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="maxVersionsPerBatch"):
        _drain(
            spark.readStream.format("txlog")
            .option("maxVersionsPerBatch", 2)
            .load(path),
            out,
            ckpt,
        )


def test_running_stream_picks_up_live_appends_exactly_once(spark, tmp_path):
    """Commits landing WHILE the query runs arrive in later micro-batches
    with no duplicates (offsets monotonic, version-keyed)."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(0,)], ["id"]))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("txlog")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        appended = 1
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out).count()
            except Exception:
                n = 0
            if n >= 3:
                break
            if appended < 3 and n >= appended:
                t.append(spark.createDataFrame([(appended,)], ["id"]))
                appended += 1
            time.sleep(1)
    finally:
        q.stop()
    assert _rows(spark.read.parquet(out)) == [(0,), (1,), (2,)]


def test_stream_lagging_past_vacuum_gets_actionable_error(spark, tmp_path):
    """A consumer whose planned range references vacuumed files must fail
    with a message naming the cause (lagged past retention) and the
    remedies, not an opaque pyarrow file error."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).coalesce(1)
    )
    t.delete(spark, "id = 1")  # rewrite: v0's file becomes unreferenced
    t.vacuum(retention_seconds=0)  # reclaims v0's original file
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="vacuum reclaimed"):
        _drain(
            spark.readStream.format("txlog")
            .option("allowRewrites", "true")
            .load(path),
            out,
            ckpt,
        )


# --------------------------------------------------------------- writers --


def test_batch_write_append_and_overwrite_commit_atomically(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    spark.createDataFrame([(1, "a")], ["id", "v"]).write.format(
        "txlog"
    ).mode("append").save(path)
    spark.createDataFrame([(2, "b")], ["id", "v"]).write.format(
        "txlog"
    ).mode("append").save(path)
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b")]
    assert [h["op"] for h in t.history()] == ["append", "append"]
    spark.createDataFrame([(9, "z")], ["id", "v"]).write.format(
        "txlog"
    ).mode("overwrite").save(path)
    assert _rows(t.read(spark)) == [(9, "z")]
    # prior versions still time-travelable (overwrite was one atomic swap)
    assert _rows(t.read(spark, version=1)) == [(1, "a"), (2, "b")]
    # no staging dirs left behind on the happy path
    assert not [d for d in os.listdir(path) if d.startswith("_staging")]


def test_stream_write_with_txn_app_id_is_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame([(10, "x")], ["id", "v"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    dst, ckpt = str(tmp_path / "dst"), str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.schema("id long, v string")
            .parquet(src)
            .writeStream.format("txlog")
            .option("path", dst)
            .option("txnAppId", "t1")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run()
    t = TxLogTable(dst)
    assert _rows(t.read(spark)) == [(10, "x")]
    assert t.history()[-1]["txn_id"] == "t1:0"
    # checkpoint loss replays batch 0: the table's log must no-op it
    import shutil

    shutil.rmtree(ckpt)
    run()
    assert _rows(t.read(spark)) == [(10, "x")]
    assert t.version() == 0  # no second commit


def test_write_refuses_tables_with_check_constraints(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.add_constraint(spark, "id_pos", "id > 0")
    with pytest.raises(Exception, match="CHECK constraints"):
        spark.createDataFrame([(2, "b")], ["id", "v"]).write.format(
            "txlog"
        ).mode("append").save(path)
    assert t.version() == 1  # nothing committed


def test_batch_read_uninitialized_table_with_user_schema_is_empty(spark, tmp_path):
    """The escape hatch the no-committed-version error advertises: an
    explicit .schema(...) on an uninitialized table reads zero rows
    instead of failing at planning time."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    df = spark.read.format("txlog").schema("id long, v string").load(path)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["id", "v"]
    # time travel into an uninitialized table is still an error
    with pytest.raises(Exception, match="no committed version"):
        spark.read.format("txlog").schema("id long").option(
            "version", 0
        ).load(path).collect()


def test_commit_files_refuses_constrained_table_inside_retry(spark, tmp_path):
    """forbid_constraints is enforced against each retry snapshot: a
    concurrent add_constraint landing between the caller's pre-check and
    the commit must abort the write, not land unvalidated rows."""
    from bigdataingestion_spark.sinks.txlog import ConstraintViolationError

    path = str(tmp_path / "t")
    t = TxLogTable(path)
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    t.append(df)
    staged, _ = t._stage_files(spark.createDataFrame([(-2, "bad")], ["id", "v"]))

    real_snapshot = t.snapshot
    raced = {"n": 0}

    def racing_snapshot(*args, **kwargs):
        snap = real_snapshot(*args, **kwargs)
        if raced["n"] == 0:
            raced["n"] += 1
            # the constraint commit lands right after our first snapshot
            TxLogTable(path).add_constraint(spark, "id_pos", "id > 0")
        return snap

    t.snapshot = racing_snapshot
    try:
        with pytest.raises(ConstraintViolationError, match="id_pos"):
            t.commit_files(staged, df.schema, forbid_constraints=True)
    finally:
        t.snapshot = real_snapshot
    # the bad rows never became part of any committed version
    assert _rows(t.read(spark)) == [(1, "a")]


def test_vacuum_preserves_nested_staging_with_fresh_leaf_writes(spark, tmp_path):
    """Partitioned staging nests files under hive dirs; only the leaf dir
    mtime moves on a new write. Vacuum must check mtimes RECURSIVELY or a
    long-running partitioned rewrite gets its staging reclaimed mid-job."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    staging = os.path.join(path, "_staging-live")
    leaf = os.path.join(staging, "a=1", "b=2")
    os.makedirs(leaf)
    with open(os.path.join(leaf, "part-x.parquet"), "wb") as fh:
        fh.write(b"live")
    old = time.time() - 10_000
    # everything stale EXCEPT the freshly-written leaf file
    os.utime(staging, (old, old))
    os.utime(os.path.join(staging, "a=1"), (old, old))
    assert t.vacuum(retention_seconds=100) == []
    assert os.path.isdir(staging)
    # once the leaf goes stale too, the whole tree is an orphan
    os.utime(os.path.join(leaf, "part-x.parquet"), (old, old))
    os.utime(leaf, (old, old))
    os.utime(os.path.join(staging, "a=1"), (old, old))
    os.utime(staging, (old, old))
    deleted = t.vacuum(retention_seconds=100)
    assert not os.path.isdir(staging)
    assert any(d.startswith("_staging-live") for d in deleted)


def test_vacuum_reclaims_orphaned_staging_dirs_after_retention(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    orphan = os.path.join(path, "_staging-ds-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-x.parquet"), "wb") as fh:
        fh.write(b"junk")
    old = time.time() - 10_000
    os.utime(os.path.join(orphan, "part-x.parquet"), (old, old))
    os.utime(orphan, (old, old))
    # retention 0 preserves staging outright (historical contract)
    assert t.vacuum(retention_seconds=0) == []
    assert os.path.isdir(orphan)
    # inside the window: preserved; beyond it: reclaimed whole
    assert t.vacuum(retention_seconds=100_000) == []
    assert os.path.isdir(orphan)
    deleted = t.vacuum(retention_seconds=100)
    assert not os.path.isdir(orphan)
    assert any(d.startswith("_staging-ds-deadbeef") for d in deleted)
    assert _rows(t.read(spark)) == [(1, "a")]  # live data untouched


# ----------------------------------------------------------- commit_files --


def test_commit_files_txn_replay_noops_and_removes_staged(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    first, _ = t._stage_files(df)
    assert t.commit_files(first, df.schema, txn_id="x:1") == 0
    replay, _ = t._stage_files(df)
    assert t.commit_files(replay, df.schema, txn_id="x:1") == 0  # no-op
    for rel in replay:  # replayed files deleted, not orphaned
        assert not os.path.exists(os.path.join(path, rel))
    assert _rows(t.read(spark)) == [(1, "a")]


def test_commit_files_retries_through_concurrent_commits(spark, tmp_path):
    """A writer that lost the create-exclusive race must retry with its
    staged files intact and land on the next version."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    staged, _ = t._stage_files(df)

    real_commit = t._commit
    raced = {"n": 0}

    def racing_commit(*args, **kwargs):
        if raced["n"] == 0:
            raced["n"] += 1
            # another writer lands between our snapshot and our commit
            t2 = TxLogTable(path)
            t2.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
        return real_commit(*args, **kwargs)

    t._commit = racing_commit
    try:
        version = t.commit_files(staged, df.schema)
    finally:
        t._commit = real_commit
    assert version == t.version()
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b")]


def test_batch_reader_stats_filter_prunes_files(spark, tmp_path):
    """option("statsFilter", ...) is stateless file PRUNING through the
    log-held min/max stats — a conservative superset of matching rows,
    paired with .filter(...) for exact results; unsupported shapes keep
    everything; LTZ terms never prune in the session-TZ-less worker."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(i, "a") for i in range(10)], ["id", "v"]).coalesce(1))
    t.append(spark.createDataFrame([(i, "b") for i in range(100, 110)], ["id", "v"]).coalesce(1))
    t.append(spark.createDataFrame([(i, "c") for i in range(200, 210)], ["id", "v"]).coalesce(1))

    base = spark.read.format("txlog")
    # prunes to the one file whose range covers the point
    pruned = base.option("statsFilter", "id = 105").load(path)
    assert sorted(r.id for r in pruned.collect()) == list(range(100, 110))
    # exact result: pair with the real filter
    assert [
        r.id for r in pruned.filter("id = 105").collect()
    ] == [105]
    # range predicate across two files
    two = (
        spark.read.format("txlog")
        .option("statsFilter", "id >= 100")
        .load(path)
    )
    assert two.count() == 20
    # unsupported shape: keeps all files (pruning never filters rows)
    allrows = (
        spark.read.format("txlog")
        .option("statsFilter", "id % 2 = 0")
        .load(path)
    )
    assert allrows.count() == 30
    # fresh reader without the option is unaffected (stateless)
    assert spark.read.format("txlog").load(path).count() == 30
