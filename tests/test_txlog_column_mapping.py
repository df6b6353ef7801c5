"""Column mapping (Delta's "name" mode): logical column names become
metadata over frozen physical parquet names, making RENAME and DROP
one-commit metadata ops — no rewrite of the data. The physical/logical
split must stay invisible everywhere else: DML, stats skipping, blooms,
CDF, the format("txlog") reader, clone, compact, and time travel all keep
working on mapped tables."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.txlog import (
    ConcurrentWriteError,
    TxLogTable,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp_path, name="t"):
    t = TxLogTable(str(tmp_path / name))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    t.enable_column_mapping()
    return t


def test_enable_freezes_names_and_records_feature(spark, tmp_path):
    t = _mk(spark, tmp_path)
    snap = t.snapshot()
    assert snap.properties.get("column.mapping") == "name"
    assert "columnMapping" in snap.reader_features
    sch = json.loads(snap.schema_json)
    assert [
        (f["name"], f["metadata"]["txlog.physicalName"])
        for f in sch["fields"]
    ] == [("id", "id"), ("v", "v")]
    # existing files stay readable without migration
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b")]
    # idempotent
    v = t.version()
    assert t.enable_column_mapping() == v


def test_enable_refuses_partitioned(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "p"))
    t.overwrite_partitions(
        spark.createDataFrame([(1, "x")], ["id", "p"]), ["p"]
    )
    with pytest.raises(ValueError, match="partition"):
        t.enable_column_mapping()


def test_rename_is_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files = set(t.snapshot().files)
    t.rename_column("v", "name")
    assert set(t.snapshot().files) == files  # zero data movement
    assert t.read(spark).columns == ["id", "name"]
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b")]
    e = t.history()[-1]
    assert e["op"] == "rename_column" and not e["add"] and not e["remove"]


def test_append_after_rename_lands_under_physical_name(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "name")
    t.append(spark.createDataFrame([(3, "c")], ["id", "name"]))
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]
    # the staged file physically holds column 'v' (the frozen name)
    new_file = (set(t.snapshot().files) - set())
    import pyarrow.parquet as pq

    phys_cols = set()
    for f in t.snapshot().files:
        phys_cols |= set(
            pq.ParquetFile(os.path.join(t.path, f)).schema_arrow.names
        )
    assert "name" not in phys_cols and "v" in phys_cols


def test_new_column_gets_fresh_physical_name(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(3, "c", 1.5)], ["id", "v", "score"]))
    sch = json.loads(t.snapshot().schema_json)
    phys = {
        f["name"]: f["metadata"]["txlog.physicalName"]
        for f in sch["fields"]
    }
    assert phys["score"].startswith("col-")


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(3, "c", 7.0)], ["id", "v", "score"]))
    t.drop_column("score")
    assert t.read(spark).columns == ["id", "v"]
    t.append(spark.createDataFrame([(4, "d", 1.0)], ["id", "v", "score"]))
    got = {r["id"]: r["score"] for r in t.read(spark).collect()}
    assert got[4] == 1.0
    assert got[3] is None  # old physical column stays buried


def test_dml_and_replace_where_on_renamed_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "name")
    t.delete(spark, "name = 'a'")
    t.update(spark, "id = 2", {"name": "'B'"})
    assert _rows(t.read(spark)) == [(2, "B")]
    t.replace_where(
        spark,
        spark.createDataFrame([(9, "B")], ["id", "name"]),
        "name = 'B'",
    )
    assert _rows(t.read(spark)) == [(9, "B")]


def test_stats_skipping_translates_renamed_keys(spark, tmp_path):
    """min/max skipping must keep pruning after a rename: stats are keyed
    by the physical name, the predicate by the logical one."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.range(0, 100).select(F.col("id")).coalesce(1))
    t.append(spark.range(1000, 1100).select(F.col("id")).coalesce(1))
    t.enable_column_mapping()
    t.rename_column("id", "key")
    t.delete(spark, "key = 1050")
    e = t.history()[-1]
    assert e["op_metrics"]["files_stat_skipped"] == 1
    assert t.read(spark).count() == 199


def test_bloom_pruning_survives_rename(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.alter_properties({"bloom.columns": "u"})
    # uuid-ish unclustered key: min/max proves nothing, blooms must
    a = spark.createDataFrame(
        [(i, f"u-{i * 7919 % 1000:03d}") for i in range(0, 500, 2)],
        ["id", "u"],
    ).coalesce(1)
    b = spark.createDataFrame(
        [(i, f"u-{i * 7919 % 1000:03d}") for i in range(1, 500, 2)],
        ["id", "u"],
    ).coalesce(1)
    t.append(a)
    t.append(b)
    t.enable_column_mapping()
    t.rename_column("u", "user_key")
    assert (
        t.snapshot().properties["bloom.columns"] == "user_key"
    )  # property follows the rename
    hit = f"u-{2 * 7919 % 1000:03d}"  # exists only in file a
    t.delete(spark, f"user_key = '{hit}' and id = 2")
    e = t.history()[-1]
    assert e["op_metrics"]["files_bloom_skipped"] >= 1
    # new writes build blooms under the (unchanged) physical sidecar keys
    t.append(
        spark.createDataFrame([(1000, "u-xyz")], ["id", "user_key"]).coalesce(1)
    )
    t.delete(spark, "user_key = 'u-xyz'")
    assert t.read(spark).filter("user_key = 'u-xyz'").count() == 0


def test_cdf_across_mapping_ops(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.alter_properties({"cdf.enabled": "true"})
    v0 = t.version()
    t.rename_column("v", "name")  # metadata-only: no change rows
    t.delete(spark, "name = 'a'")
    cdf = t.read_cdf(spark, from_version=v0)
    got = [
        (r["_change_type"], r["id"]) for r in cdf.collect()
    ]
    assert got == [("delete", 1)]


def test_datasource_reads_mapped_table(spark, tmp_path):
    from bigdataingestion_spark.sources.txlog_datasource import register

    register(spark)
    t = _mk(spark, tmp_path)
    t.rename_column("v", "name")
    t.append(spark.createDataFrame([(3, "c")], ["id", "name"]))
    t.delete(spark, "name = 'b'", deletion_vectors=True)
    got = spark.read.format("txlog").load(t.path)
    assert got.columns == ["id", "name"]
    assert _rows(got) == [(1, "a"), (3, "c")]


def test_datasource_writer_refuses_mapped_table(spark, tmp_path):
    from bigdataingestion_spark.sources.txlog_datasource import register

    register(spark)
    t = _mk(spark, tmp_path)
    df = spark.createDataFrame([(9, "z")], ["id", "v"])
    with pytest.raises(Exception, match="column-mapped"):
        df.write.format("txlog").mode("append").save(t.path)


def test_compact_preserves_physical_names(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "name")
    for i in range(3, 7):
        t.append(spark.createDataFrame([(i, "x")], ["id", "name"]))
    t.compact(spark, full=True)
    assert t.read(spark).count() == 6
    import pyarrow.parquet as pq

    for f in t.snapshot().files:
        names = pq.ParquetFile(
            os.path.join(t.path, f)
        ).schema_arrow.names
        assert "v" in names and "name" not in names


def test_concurrent_rename_conflicts_with_dml(spark, tmp_path):
    """A rename landing between a DML's snapshot and its commit must
    conflict: the DML's staged output was derived under the old
    mapping."""
    t = _mk(spark, tmp_path)
    real_commit = t._commit
    fired = {"done": False}

    def racing_commit(*a, **kw):
        if not fired["done"]:
            fired["done"] = True
            TxLogTable(t.path).rename_column("v", "name")
        return real_commit(*a, **kw)

    t._commit = racing_commit
    with pytest.raises(ConcurrentWriteError, match="mapping changed"):
        t.delete(spark, "v = 'a'")
    t._commit = real_commit
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b")]  # DML never landed


def test_shallow_clone_carries_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "name")
    clone = t.clone_to(spark, str(tmp_path / "c"), shallow=True)
    assert clone.read(spark).columns == ["id", "name"]
    assert _rows(clone.read(spark)) == [(1, "a"), (2, "b")]
    clone.rename_column("name", "label")  # independent metadata
    assert t.read(spark).columns == ["id", "name"]


def test_restore_across_enable_then_reenable(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    v_pre = t.version()
    t.enable_column_mapping()
    t.rename_column("v", "name")
    t.restore(v_pre)
    # restored schema is unmapped: rename must refuse until re-enabled
    assert t.read(spark).columns == ["id", "v"]
    with pytest.raises(ValueError, match="requires column mapping"):
        t.rename_column("v", "w")
    t.enable_column_mapping()  # re-freeze
    t.rename_column("v", "w")
    assert t.read(spark).columns == ["id", "w"]


def test_rename_refused_while_constraint_references(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "v_nonempty", "length(v) > 0")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("v", "name")
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("v")
    t.drop_constraint("v_nonempty")
    t.rename_column("v", "name")
    assert t.read(spark).columns == ["id", "name"]


def test_zorder_compact_on_renamed_column(spark, tmp_path):
    """OPTIMIZE ZORDER BY a RENAMED column: the cluster key is logical,
    the rewrite stages under physical names, and post-compact skipping
    on the renamed key still prunes (stats translate through the
    mapping)."""
    t = TxLogTable(str(tmp_path / "t"))
    for lo in range(0, 400, 100):
        t.append(
            spark.range(lo, lo + 100).select(F.col("id")).coalesce(1)
        )
    t.enable_column_mapping()
    t.rename_column("id", "key")
    t.compact(spark, target_file_bytes=1024, zorder_by=["key"])
    assert t.read(spark).count() == 400
    assert len(t.snapshot().files) >= 2  # the skip assert needs >1 file
    t.delete(spark, "key = 7")
    e = t.history()[-1]
    # z-ordered layout: most files provably exclude key=7
    assert e["op_metrics"]["files_stat_skipped"] >= 1
    assert t.read(spark).count() == 399


def test_merge_upsert_on_renamed_key(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("id", "pk")
    src = spark.createDataFrame([(2, "B2"), (3, "c")], ["pk", "v"])
    t.merge_upsert(spark, src, keys=["pk"])
    assert _rows(t.read(spark)) == [(1, "a"), (2, "B2"), (3, "c")]
    e = t.history()[-1]
    assert e["op"] == "merge"
    # idempotent replay + a second merge touching nothing but new keys
    t.merge_upsert(
        spark,
        spark.createDataFrame([(4, "d")], ["pk", "v"]),
        keys=["pk"],
    )
    assert t.read(spark).count() == 4


def test_concurrent_new_column_appends_conflict_not_null_out(spark, tmp_path):
    """Two concurrent appends each adding column 'c' assign different
    uuid physical names; the name-keyed schema merge would keep the
    winner's and point the loser's files at a column they don't contain
    (silent NULLs). The reconcile must refuse instead."""
    t = _mk(spark, tmp_path)
    real_commit = t._commit
    fired = {"done": False}

    def racing_commit(*a, **kw):
        if not fired["done"]:
            fired["done"] = True
            TxLogTable(t.path).append(
                spark.createDataFrame([(10, "w", 1.0)], ["id", "v", "c"])
            )
        return real_commit(*a, **kw)

    t._commit = racing_commit
    with pytest.raises(ConcurrentWriteError, match="physical name"):
        t.append(spark.createDataFrame([(11, "x", 2.0)], ["id", "v", "c"]))
    t._commit = real_commit
    # the winner's row is intact with its value; no silent NULLs landed
    got = {r["id"]: r["c"] for r in t.read(spark).collect()}
    assert got == {1: None, 2: None, 10: 1.0}


def test_stale_homonym_stats_never_skip_unsoundly(spark, tmp_path):
    """Drop column x, re-add it: old files' log-held stats still carry
    the stale physical key 'x' (nulls=0), which must NOT prove anything
    about the re-added x (whose value in old files is NULL). DELETE
    WHERE x IS NULL has to scan and remove those rows."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(50)], ["id", "x"]
        ).coalesce(1)
    )
    t.enable_column_mapping()
    t.drop_column("x")
    t.append(
        spark.createDataFrame([(100, 7.5)], ["id", "x"]).coalesce(1)
    )
    # all 50 old rows have (re-added) x NULL; the one new row doesn't
    t.delete(spark, "x IS NULL")
    assert _rows(t.read(spark)) == [(100, 7.5)]


def test_unmapped_schema_narrowing_still_reconciles(spark, tmp_path):
    """Regression guard: on a table that never enabled mapping, an
    append racing a schema-narrowing overwrite must reconcile exactly as
    before — the mapping-drift conflict is mapped-tables-only."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    real_commit = t._commit
    fired = {"done": False}

    def racing_commit(*a, **kw):
        if not fired["done"]:
            fired["done"] = True
            TxLogTable(t.path).overwrite(
                spark.createDataFrame([(5,)], ["id"])  # drops column v
            )
        return real_commit(*a, **kw)

    t._commit = racing_commit
    v = t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
    t._commit = real_commit
    assert v == 2  # reconciled at the next version, no spurious conflict
    got = sorted(
        (r["id"], r["v"]) for r in t.read(spark).collect()
    )
    assert got == [(2, "b"), (5, None)]


def test_commit_files_refuses_diverged_mapping(spark, tmp_path):
    """The external-file commit path cannot apply logical->physical
    renames, so once any physical name diverges it must refuse rather
    than register files whose columns the mapped read never projects."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField as SF,
        StructType as ST,
    )

    t = _mk(spark, tmp_path)
    t.rename_column("v", "name")
    rel = "part-external-test.parquet"
    pq.write_table(
        pa.table({"id": [99], "name": ["ext"]}),
        os.path.join(t.path, rel),
    )
    with pytest.raises(ValueError, match="column mapping"):
        t.commit_files(
            [rel],
            ST([SF("id", LongType()), SF("name", StringType())]),
        )
    assert not os.path.exists(os.path.join(t.path, rel))  # cleaned up


def test_stream_refuses_drop_readd_mapping_drift(spark, tmp_path):
    """A LIVE stream resolved logical->physical at init; a mid-stream
    drop + re-add swaps the physical name without changing the logical
    schema (the added/retyped check cannot see it), so the reader must
    refuse loudly instead of delivering NULLs for the re-added column.
    Exercised at the reader level — a restarted query re-resolves the
    mapping and is naturally correct; only a reader instance that
    OUTLIVES the swap can hit it."""
    from bigdataingestion_spark.sources.txlog_datasource import (
        _TxLogStreamReader,
    )

    t = _mk(spark, tmp_path)
    # a live reader, created while the mapping still said v -> v
    reader = _TxLogStreamReader(
        {"path": t.path}, t.read(spark).schema
    )
    lo = t.version()
    t.drop_column("v")
    t.append(spark.createDataFrame([(9, "new")], ["id", "v"]))
    with pytest.raises(ValueError, match="mapping changed"):
        reader.partitions({"version": lo}, {"version": t.version()})


def test_rename_collision_and_missing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "id")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("ghost", "x")
    t.drop_column("id")
    with pytest.raises(ValueError, match="only column"):
        t.drop_column("v")
