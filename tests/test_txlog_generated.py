"""Generated columns (Delta's GENERATED ALWAYS AS): the generation SQL
expression lives in the schema; every write computes the column when the
batch omits it and validates it when supplied, so derived columns (the
classic date-bucket) stay consistent by table contract instead of by
writer discipline."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.txlog import (
    GeneratedColumnViolationError,
    TxLogTable,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp_path):
    """Empty-created table with day = id % 7 declared before first data."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_generated_column(spark, "day", "id % 7")
    return t


def test_omitted_column_is_computed(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(1, "a"), (14, "b")], ["id", "v"]))
    assert _rows(t.read(spark).select("id", "day")) == [(1, 1), (14, 0)]
    assert "generatedColumns" in t.snapshot().writer_features


def test_supplied_column_validated(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ok = spark.createDataFrame([(3, "c", 3)], ["id", "v", "day"])
    t.append(ok)
    bad = spark.createDataFrame([(4, "d", 9)], ["id", "v", "day"])
    with pytest.raises(GeneratedColumnViolationError, match="day"):
        t.append(bad)
    assert t.read(spark).count() == 1


def test_declare_on_existing_column_validates_table(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, 1), (8, 5)], ["id", "day"])
    )
    with pytest.raises(GeneratedColumnViolationError, match="existing rows"):
        t.add_generated_column(spark, "day", "id % 7")
    # a consistent table accepts the declaration and enforces it after
    t2 = TxLogTable(str(tmp_path / "t2"))
    t2.append(spark.createDataFrame([(1, 1), (8, 1)], ["id", "day"]))
    t2.add_generated_column(spark, "day", "id % 7")
    t2.append(spark.createDataFrame([(14,)], ["id"]))
    assert _rows(t2.read(spark)) == [(1, 1), (8, 1), (14, 0)]


def test_new_column_on_nonempty_table_refused(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1,)], ["id"]))
    with pytest.raises(ValueError, match="non-empty"):
        t.add_generated_column(spark, "day", "id % 7")


def test_merge_and_replace_where_compute(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_upsert(
        spark,
        spark.createDataFrame([(2, "x"), (9, "y")], ["id", "v"]),
        keys=["id"],
    )
    assert _rows(t.read(spark).select("id", "day")) == [(2, 2), (9, 2)]
    t.replace_where(
        spark,
        spark.createDataFrame([(16, "z")], ["id", "v"]),
        "day = 2",
        validate=False,  # predicate references the computed column
    )
    got = _rows(t.read(spark).select("id", "day"))
    assert got == [(16, 2)]


def test_update_refuses_generated_and_sources(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    with pytest.raises(GeneratedColumnViolationError, match="derived"):
        t.update(spark, "v = 'a'", {"day": "99"})
    with pytest.raises(GeneratedColumnViolationError, match="derived from"):
        t.update(spark, "v = 'a'", {"id": "id + 1"})
    # assigning an unrelated column stays allowed
    t.update(spark, "v = 'a'", {"v": "'A'"})
    assert _rows(t.read(spark).select("id", "v", "day")) == [(1, "A", 1)]


def test_overwrite_carries_generation_contract(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.overwrite(spark.createDataFrame([(21, "w")], ["id", "v"]))
    # the backfill did not strip the contract: day was computed, and the
    # next bad write still refuses
    assert _rows(t.read(spark).select("id", "day")) == [(21, 0)]
    with pytest.raises(GeneratedColumnViolationError):
        t.append(spark.createDataFrame([(5, "e", 9)], ["id", "v", "day"]))


def test_datasource_writer_refuses_generated(spark, tmp_path):
    import glob
    import os

    from bigdataingestion_spark.sources.txlog_datasource import register

    register(spark)
    t = _mk(spark, tmp_path)
    before = set(glob.glob(os.path.join(t.path, "part-*.parquet")))
    df = spark.createDataFrame([(9, "z")], ["id", "v"])
    with pytest.raises(Exception, match="generated"):
        df.write.format("txlog").mode("append").save(t.path)
    # the refusal fires strictly pre-commit: the landed-then-refused
    # files are reclaimed, not left orphaned in the root for raw readers
    assert set(glob.glob(os.path.join(t.path, "part-*.parquet"))) == before


def test_supplied_column_case_insensitive(spark, tmp_path):
    """Under spark.sql.caseSensitive=false a batch supplying 'DAY' IS
    supplying 'day': wrong values must refuse, never be silently
    replaced by the computed ones."""
    t = _mk(spark, tmp_path)
    bad = spark.createDataFrame([(4, "d", 9)], ["id", "v", "DAY"])
    with pytest.raises(GeneratedColumnViolationError):
        t.append(bad)
    ok = spark.createDataFrame([(4, "d", 4)], ["id", "v", "DAY"])
    t.append(ok)
    assert t.read(spark).count() == 1


def test_rename_and_drop_of_generation_source_refused(spark, tmp_path):
    """Renaming or dropping a column a generation expression reads would
    wedge every subsequent write (the stored SQL stops resolving)."""
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.enable_column_mapping()
    with pytest.raises(ValueError, match="derive from"):
        t.rename_column("id", "event_id")
    with pytest.raises(ValueError, match="derive from"):
        t.drop_column("id")
    # the generated column ITSELF renames/drops fine
    t.rename_column("day", "bucket")
    t.append(spark.createDataFrame([(14, "b")], ["id", "v"]))
    assert sorted(
        (r["id"], r["bucket"]) for r in t.read(spark).collect()
    ) == [(1, 1), (14, 0)]
    t.drop_column("bucket")
    t.append(spark.createDataFrame([(2, "c")], ["id", "v"]))  # unwedged
    assert t.read(spark).columns == ["id", "v"]


def test_partitioned_generated_partition_column(spark, tmp_path):
    """The Delta headline use: partition by a GENERATED date bucket the
    writers never have to compute themselves."""
    t = TxLogTable(str(tmp_path / "t"))
    t.overwrite_partitions(
        spark.createDataFrame([], "id bigint, day bigint"), ["day"]
    )
    t.add_generated_column(spark, "day", "id % 3")
    t.overwrite_partitions(
        spark.createDataFrame([(1,), (2,), (3,)], ["id"]), ["day"]
    )
    got = t.read(spark)
    assert _rows(got.select("id", "day")) == [(1, 1), (2, 2), (3, 0)]
    # partition pruning works on the generated hive layout
    assert _rows(got.filter("day = 0").select("id")) == [(3,)]


def test_describe_detail_reports_everything(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.enable_column_mapping()
    t.rename_column("v", "name")
    t.add_constraint(spark, "pos", "id > 0")
    t.delete(spark, "id = 99", deletion_vectors=True)  # no-op, no commit
    d = t.describe_detail()
    assert d["format"] == "txlog" and d["num_files"] == 1
    assert d["columns"] == ["id", "name", "day"]
    assert d["constraints"] == {"pos": "id > 0"}
    assert d["generated_columns"] == {"day": "id % 7"}
    assert d["column_mapping"] == {"name": "v"}
    assert "columnMapping" in d["reader_features"]
    assert "generatedColumns" in d["writer_features"]
    assert d["size_bytes"] > 0
    # uninitialized path: a marker, not an error
    assert TxLogTable(str(tmp_path / "ghost")).describe_detail()["version"] == -1


def test_generated_with_column_mapping(spark, tmp_path):
    """Generated metadata and mapping metadata coexist on one field; the
    generated column participates in rename like any other."""
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.enable_column_mapping()
    t.rename_column("day", "bucket")
    # the generation expression still references id; computation happens
    # under the NEW logical name
    t.append(spark.createDataFrame([(14, "b")], ["id", "v"]))
    assert _rows(t.read(spark).select("id", "bucket")) == [(1, 1), (14, 0)]


def test_update_recompute_true_recomputes_dependents(spark, tmp_path):
    """VERDICT r7 item 5: recompute=True gives Delta's UPDATE semantics —
    assigning a generation INPUT recomputes the dependent column from the
    post-image; unmatched rows are reproduced bit-for-bit; the refusal
    stays the default."""
    t = _mk(spark, tmp_path)
    t.append(
        spark.createDataFrame([(1, "a"), (14, "b"), (20, "c")], ["id", "v"])
    )
    # default still refuses (and now names the escape hatch)
    with pytest.raises(GeneratedColumnViolationError, match="recompute=True"):
        t.update(spark, "v = 'a'", {"id": "id + 1"})
    t.update(spark, "v = 'a'", {"id": "id + 1"}, recompute=True)
    assert _rows(t.read(spark).select("id", "v", "day")) == [
        (2, "a", 2),
        (14, "b", 0),
        (20, "c", 6),
    ]
    # the rewritten rows satisfy the invariant: the next append's
    # validation pass (whole-table read in add_generated_column's shape)
    # still holds, and direct assignment stays refused even w/ recompute
    with pytest.raises(GeneratedColumnViolationError, match="derived"):
        t.update(spark, "v = 'a'", {"day": "99"}, recompute=True)


def test_update_recompute_cdf_postimage_consistent(spark, tmp_path):
    """The CDF post-image must carry the RECOMPUTED generated value, not
    the stale pre-image one."""
    t = _mk(spark, tmp_path)
    t.alter_properties({"cdf.enabled": "true"})
    t.append(spark.createDataFrame([(1, "a"), (14, "b")], ["id", "v"]))
    v = t.version()
    t.update(spark, "id = 1", {"id": "id + 6"}, recompute=True)
    chg = t.read_cdf(spark, from_version=v)
    got = sorted(
        (r._change_type, r.id, r.day) for r in chg.collect()
    )
    assert got == [("update_postimage", 7, 0), ("update_preimage", 1, 1)]
    assert _rows(t.read(spark).select("id", "day")) == [(7, 0), (14, 0)]


def test_generated_on_generated_refused_at_declaration(spark, tmp_path):
    """Delta's rule, load-bearing for recompute: a chain g2 = f(g1)
    would read g1's PRE-recompute value in update(recompute=True)'s
    single post-image pass and silently break g2's invariant — refused
    when declared, so the chain can never exist."""
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="cannot derive from another"):
        t.add_generated_column(spark, "day2", "day + 1")
    # inlining the expression is the documented path
    t.add_generated_column(spark, "day2", "(id % 7) + 1")
    t.append(spark.createDataFrame([(14, "b")], ["id", "v"]))
    assert _rows(t.read(spark).select("id", "day", "day2")) == [(14, 0, 1)]
    t.update(spark, "v = 'b'", {"id": "id + 1"}, recompute=True)
    assert _rows(t.read(spark).select("id", "day", "day2")) == [(15, 1, 2)]
