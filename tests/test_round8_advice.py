"""Round-8 advisory regressions (ADVICE r7): bloom probes must apply the
stats path's literal/column kind-compatibility gate (cross-kind terms
prove nothing), CLONE must carry the columnMapping reader feature, deep
clone of a shallow clone must localize borrowed absolute refs, the
streaming reader must name the checkpoint-rebase path on a rename-spanning
range, and append/overwrite must persist a source whose validation probes
will run."""

from __future__ import annotations

import os

import pytest

from bigdataingestion_spark.sinks.txlog import TxLogTable
from bigdataingestion_spark.sources.txlog_datasource import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------- bloom cross-kind literals --


def _bloomed_string_table(spark, tmp_path):
    """bloom.columns=code over a STRING column; '05' seeded so a numeric
    literal probe ('code = 5') diverges from Spark's own comparison
    (which casts the COLUMN: '05' = 5 matches)."""
    t = TxLogTable(str(tmp_path / "t"))
    # ANSI mode: every value must survive CAST(code AS BIGINT), since
    # Spark evaluates `code = 5` by casting the COLUMN. Both indexed
    # files' lexicographic [min, max] ranges CONTAIN '05' so min/max
    # stats prove nothing and only the bloom can (wrongly or rightly)
    # exclude them.
    t.append(spark.createDataFrame([("000", 0)], ["code", "n"]).coalesce(1))
    t.alter_properties({"bloom.columns": "code"})
    t.append(
        spark.createDataFrame([("05", 1), ("91", 1)], ["code", "n"]).coalesce(1)
    )
    t.append(
        spark.createDataFrame([("004", 2), ("99", 2)], ["code", "n"]).coalesce(1)
    )
    return t


def test_bloom_numeric_literal_on_string_column_does_not_skip_dml(
    spark, tmp_path
):
    """ADVICE r7 (high) repro: read().filter("code = 5") matches the '05'
    row (Spark casts the column to numeric), so delete(spark, "code = 5")
    must delete it — the bloom, which hashed only the exact string '5',
    must prove nothing for a cross-kind term instead of 'proving' every
    file disjoint and silently skipping the DML."""
    t = _bloomed_string_table(spark, tmp_path)
    assert t.read(spark).filter("code = 5").count() == 1
    v = t.version()
    t.delete(spark, "code = 5")
    assert t.version() > v, "DML was wrongly skipped by the bloom index"
    assert _rows(t.read(spark)) == [
        ("000", 0),
        ("004", 2),
        ("91", 1),
        ("99", 2),
    ]
    m = t.history()[-1]["op_metrics"]
    assert m["files_bloom_skipped"] == 0


def test_bloom_same_kind_string_probe_still_skips(spark, tmp_path):
    """The conservative gate must not disable the index for the shapes it
    was built for: an exact-string point delete still bloom-prunes the
    foreign files and an absent key is a commit-free no-op."""
    t = _bloomed_string_table(spark, tmp_path)
    t.delete(spark, "code = '05'")
    m = t.history()[-1]["op_metrics"]
    assert m["files_bloom_skipped"] >= 1, m
    assert m["files_rewritten"] == 1
    v = t.version()
    t.delete(spark, "code = 'absent-key'")
    assert t.version() == v


def test_bloom_cross_kind_update_applies(spark, tmp_path):
    """UPDATE goes through the same finding pass: a cross-kind predicate
    must reach the data, not vanish into a false disjointness proof."""
    t = _bloomed_string_table(spark, tmp_path)
    t.update(spark, "code = 91", {"n": "777"})
    got = {r.code: r.n for r in t.read(spark).collect()}
    assert got["91"] == 777


# ------------------------------------------ clone: columnMapping feature --


def _mapped(spark, tmp_path, name="src"):
    t = TxLogTable(str(tmp_path / name))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    t.enable_column_mapping()
    t.rename_column("v", "name")
    return t


@pytest.mark.parametrize("shallow", [True, False])
def test_clone_carries_column_mapping_feature(spark, tmp_path, shallow):
    """ADVICE r7 (medium): the clone starts a fresh log, so without
    re-declaration a feature-ignorant build would scan physical-named
    parquet under logical names and return NULLs. Any commit carrying a
    mapped schema must (re-)declare the columnMapping reader feature."""
    src = _mapped(spark, tmp_path)
    clone = src.clone_to(spark, str(tmp_path / f"dst{shallow}"), shallow=shallow)
    snap = clone.snapshot()
    assert "columnMapping" in snap.reader_features, snap.reader_features
    assert clone.read(spark).columns == ["id", "name"]
    assert _rows(clone.read(spark)) == [(1, "a"), (2, "b")]
    # a rename ON the clone keeps the declaration alive
    clone.rename_column("name", "label")
    assert "columnMapping" in clone.snapshot().reader_features
    assert _rows(clone.read(spark).select("id", "label")) == [(1, "a"), (2, "b")]


# --------------------------------------- deep clone of a shallow clone --


def test_deep_clone_of_shallow_clone_localizes_and_survives_vacuum(
    spark, tmp_path
):
    """ADVICE r7 (medium): the shallow clone's refs are ABSOLUTE source
    paths; deep-cloning it (the docstring's own vacuum-safety
    recommendation) previously raised SameFileError — and would have
    committed the original refs. It must copy into the target root under
    fresh relative names, rekeying stats/dv/bloom refs, and the result
    must survive the source's files disappearing."""
    src = TxLogTable(str(tmp_path / "src"))
    src.append(spark.createDataFrame([("k1", 1)], ["key", "n"]).coalesce(1))
    src.alter_properties({"bloom.columns": "key"})
    src.append(
        spark.createDataFrame([("k2", 2), ("k3", 3)], ["key", "n"]).coalesce(1)
    )
    src.append(
        spark.createDataFrame([("k4", 4), ("k5", 5)], ["key", "n"]).coalesce(1)
    )
    src.delete(spark, "key = 'k5'", deletion_vectors=True)  # dv sidecar

    c1 = src.clone_to(spark, str(tmp_path / "c1"))  # shallow: absolute refs
    assert any(os.path.isabs(f) for f in c1.snapshot().files)
    want = _rows(c1.read(spark))
    assert want == [("k1", 1), ("k2", 2), ("k3", 3), ("k4", 4)]

    c2 = c1.clone_to(spark, str(tmp_path / "c2"), shallow=False)
    snap = c2.snapshot()
    assert not any(os.path.isabs(f) for f in snap.files)
    for f in snap.files:
        assert os.path.exists(os.path.join(c2.path, f))
    for dv in snap.dvs.values():
        assert not os.path.isabs(dv)
        assert os.path.exists(os.path.join(c2.path, dv))
    for st in snap.file_stats.values():
        b = isinstance(st, dict) and st.get("__bloom__")
        if b:
            assert not os.path.isabs(b)
            assert os.path.exists(os.path.join(c2.path, b))
    assert _rows(c2.read(spark)) == want
    assert "externalFiles" not in snap.reader_features

    # the deep clone is the vacuum-safety path: source rows replaced and
    # reclaimed -> c2 still reads, and its carried bloom index still
    # prunes (rekeyed sidecar refs resolve)
    src.overwrite(spark.createDataFrame([("zz", 0)], ["key", "n"]))
    src.vacuum(retention_seconds=0.0)
    assert _rows(c2.read(spark)) == want
    c2.delete(spark, "key = 'k3'")
    m = c2.history()[-1]["op_metrics"]
    assert m["files_rewritten"] == 1
    assert _rows(c2.read(spark)) == [("k1", 1), ("k2", 2), ("k4", 4)]


def test_deep_clone_multi_file_matches_and_skips(spark, tmp_path):
    """Distributed-copy sanity at a few dozen files: content identical,
    stats rekeyed so min/max skipping fires on the copy."""
    src = TxLogTable(str(tmp_path / "src"))
    for g in range(12):
        src.append(
            spark.createDataFrame(
                [(g * 10 + i, g) for i in range(10)], ["id", "g"]
            ).coalesce(1)
        )
    clone = src.clone_to(spark, str(tmp_path / "dst"), shallow=False)
    assert _rows(clone.read(spark)) == _rows(src.read(spark))
    clone.delete(spark, "id = 5")  # one file holds id=5; stats prune rest
    m = clone.history()[-1]["op_metrics"]
    assert m["files_stat_skipped"] >= 10, m
    assert m["files_rewritten"] == 1


# ------------------------------------- stream spanning a column rename --


def test_stream_spanning_rename_names_checkpoint_rebase(spark, tmp_path):
    """ADVICE r7 (low): a micro-batch range spanning pre-rename commits
    AND the rename wedges under either declared schema, so the error must
    say the checkpoint needs rebasing — not promise that a restart
    recovers."""
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.enable_column_mapping()
    t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
    t.rename_column("v", "name")
    t.append(spark.createDataFrame([(3, "c")], ["id", "name"]))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="Rebase the checkpoint") as ei:
        q = (
            spark.readStream.format("txlog")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    assert "RENAME" in str(ei.value) or "SAME" in str(ei.value)


# -------------------------- append/overwrite persist before validation --


def test_append_persists_source_when_validation_probes_run(
    spark, tmp_path, monkeypatch
):
    """ADVICE r7 (low): on a constrained table the CHECK probe and the
    staging pass must see the SAME rows — the source is persisted before
    validation (and released after), exactly as replace_where/merge do.
    An unconstrained, ungenerated table skips the persist (appends must
    not pay a cache for probes that never run)."""
    staged = []  # (df, was_cached_at_staging_time)
    real = TxLogTable._stage_files

    def spy(self, df, *a, **k):
        sl = df.storageLevel
        staged.append((df, sl.useMemory or sl.useDisk))
        return real(self, df, *a, **k)

    monkeypatch.setattr(TxLogTable, "_stage_files", spy)

    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1,)], ["n"]))  # no snapshot: no persist
    assert staged[-1][1] is False
    t.append(spark.createDataFrame([(2,)], ["n"]))  # no probes: no persist
    assert staged[-1][1] is False
    t.add_constraint(spark, "n_pos", "n > 0")
    t.append(spark.createDataFrame([(3,)], ["n"]))
    cached, was = staged[-1]
    assert was is True  # validated AND staged from the same cached rows
    t.overwrite(spark.createDataFrame([(7,)], ["n"]))
    cached_ow, was_ow = staged[-1]
    assert was_ow is True
    # both released after the op (no cache leak)
    for df in (cached, cached_ow):
        assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)
    assert _rows(t.read(spark)) == [(7,)]


def test_append_caller_cached_source_left_alone(spark, tmp_path):
    """A caller-persisted source must not be double-persisted or
    unpersisted out from under the caller."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1,)], ["n"]))
    t.add_constraint(spark, "n_pos", "n > 0")
    df = spark.createDataFrame([(5,)], ["n"]).persist()
    try:
        t.append(df)
        assert df.storageLevel.useMemory or df.storageLevel.useDisk
    finally:
        df.unpersist()
    assert _rows(t.read(spark)) == [(1,), (5,)]
