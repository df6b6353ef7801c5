"""replace_where: Delta's arbitrary-predicate selective overwrite as ONE
atomic commit (delete matching + insert) with DELETE's cost shape — only
files that actually hold matching rows are rewritten, the rest carry by
reference (reference ING:302-306 relies on Delta overwrite semantics; this
is the arbitrary-predicate generalization its partition overwrite lacks)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.txlog import TxLogTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp_path, name="t"):
    t = TxLogTable(str(tmp_path / name))
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        t.append(
            spark.range(lo, hi)
            .select(F.col("id"), (F.col("id") % 10).alias("day"))
            .coalesce(1)
        )
    return t


def test_replace_matching_range_atomically(spark, tmp_path):
    t = _mk(spark, tmp_path)
    fresh = spark.createDataFrame(
        [(100, 3), (101, 3)], ["id", "day"]
    ).withColumn("day", F.col("day").cast("bigint"))
    v = t.replace_where(spark, fresh, "day = 3")
    got = _rows(t.read(spark))
    # the three old day=3 rows (3, 13, 23) are gone; the two new ones in
    assert (3, 3) not in got and (13, 3) not in got and (23, 3) not in got
    assert (100, 3) in got and (101, 3) in got
    assert t.read(spark).count() == 30 - 3 + 2
    e = t.history()[-1]
    assert e["op"] == "replace_where" and e["version"] == v
    # every pre-existing file held a day=3 row, so all three rewrote
    assert e["op_metrics"]["files_rewritten"] == 3


def test_untouched_files_carry_by_reference(spark, tmp_path):
    """DELETE's cost shape: files provably disjoint from the predicate
    are never rewritten — the commit carries them untouched."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.range(0, 10).select(F.col("id")).coalesce(1))
    t.append(spark.range(100, 110).select(F.col("id")).coalesce(1))
    before = set(t.snapshot().files)
    fresh = spark.createDataFrame([(105,)], ["id"])
    t.replace_where(spark, fresh, "id >= 100")
    e = t.history()[-1]
    assert e["op_metrics"]["files_rewritten"] == 1
    assert e["op_metrics"]["files_stat_skipped"] == 1
    # the id<10 file is still the same physical file
    assert len(before & set(t.snapshot().files)) == 1
    assert _rows(t.read(spark)) == [(i,) for i in range(10)] + [(105,)]


def test_inserted_rows_must_satisfy_predicate(spark, tmp_path):
    t = _mk(spark, tmp_path)
    stray = spark.createDataFrame([(200, 7)], ["id", "day"]).withColumn(
        "day", F.col("day").cast("bigint")
    )
    with pytest.raises(ValueError, match="violates the replacement"):
        t.replace_where(spark, stray, "day = 3")
    # validate=False trusts the caller and lands the row
    t.replace_where(spark, stray, "day = 3", validate=False)
    got = _rows(t.read(spark))
    assert (200, 7) in got and (13, 3) not in got


def test_empty_source_degrades_to_delete(spark, tmp_path):
    t = _mk(spark, tmp_path)
    empty = spark.createDataFrame([], "id bigint, day bigint")
    t.replace_where(spark, empty, "day = 3")
    assert t.read(spark).count() == 27
    assert t.read(spark).filter("day = 3").count() == 0


def test_no_match_degrades_to_insert(spark, tmp_path):
    t = _mk(spark, tmp_path)
    fresh = spark.createDataFrame([(300, 99)], ["id", "day"]).withColumn(
        "day", F.col("day").cast("bigint")
    )
    t.replace_where(spark, fresh, "day = 99")
    assert t.read(spark).count() == 31
    assert t.history()[-1]["op_metrics"]["files_rewritten"] == 0


def test_noop_without_commit(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.version()
    empty = spark.createDataFrame([], "id bigint, day bigint")
    assert t.replace_where(spark, empty, "day = 99") == v
    assert t.version() == v  # no commit appended


def test_txn_id_replay_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    fresh = spark.createDataFrame([(100, 3)], ["id", "day"]).withColumn(
        "day", F.col("day").cast("bigint")
    )
    v1 = t.replace_where(spark, fresh, "day = 3", txn_id="backfill-3")
    v2 = t.replace_where(spark, fresh, "day = 3", txn_id="backfill-3")
    assert v1 == v2
    assert t.read(spark).filter("id = 100").count() == 1


def test_null_predicate_rows_are_kept(spark, tmp_path):
    """Three-valued logic, same as DELETE: a row where the predicate
    evaluates NULL is neither matched nor replaced."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b")], ["id", "v"]
        )
    )
    fresh = spark.createDataFrame([(9, "a")], ["id", "v"])
    t.replace_where(spark, fresh, "v = 'a'")
    got = _rows(t.read(spark))
    assert (2, None) in got and (9, "a") in got and (1, "a") not in got


def test_time_travel_sees_pre_replace_state(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_before = t.version()
    fresh = spark.createDataFrame([(100, 3)], ["id", "day"]).withColumn(
        "day", F.col("day").cast("bigint")
    )
    t.replace_where(spark, fresh, "day = 3")
    assert t.read(spark, version=v_before).count() == 30
    assert t.read(spark).count() == 28


def test_cdf_materializes_delete_and_insert(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.range(0, 10).select(
            F.col("id"), (F.col("id") % 2).alias("par")
        )
    )
    t.alter_properties({"cdf.enabled": "true"})
    fresh = spark.createDataFrame([(100, 1), (102, 1)], ["id", "par"])
    fresh = fresh.withColumn("par", F.col("par").cast("bigint"))
    v = t.replace_where(spark, fresh, "par = 1")
    cdf = t.read_cdf(spark, from_version=v - 1, to_version=v)
    by_type = {
        r["_change_type"]: r["n"]
        for r in cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {"delete": 5, "insert": 2}
    deleted = {
        r["id"]
        for r in cdf.filter("_change_type = 'delete'").collect()
    }
    assert deleted == {1, 3, 5, 7, 9}


def test_cdf_disabled_range_refuses_cdf_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    fresh = spark.createDataFrame([(100, 3)], ["id", "day"]).withColumn(
        "day", F.col("day").cast("bigint")
    )
    v = t.replace_where(spark, fresh, "day = 3")
    with pytest.raises(ValueError, match="no change data"):
        t.read_cdf(spark, from_version=v - 1, to_version=v)


def test_insert_only_replace_synthesized_in_cdf_without_feed(spark, tmp_path):
    """A replace_where that matched NOTHING removed no files, so even
    with the feed off its changes are derivable from the adds — read_cdf
    synthesizes inserts instead of refusing (append semantics)."""
    t = _mk(spark, tmp_path)
    fresh = spark.createDataFrame([(300, 99)], ["id", "day"]).withColumn(
        "day", F.col("day").cast("bigint")
    )
    v = t.replace_where(spark, fresh, "day = 99")
    cdf = t.read_cdf(spark, from_version=v - 1, to_version=v)
    got = [(r["_change_type"], r["id"]) for r in cdf.collect()]
    assert got == [("insert", 300)]


def test_partitioned_table_replace(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    df = spark.range(0, 20).select(
        F.col("id"), (F.col("id") % 4).alias("p")
    )
    t.overwrite_partitions(df, ["p"])
    fresh = spark.createDataFrame([(100, 2)], ["id", "p"]).withColumn(
        "p", F.col("p").cast("bigint")
    )
    t.replace_where(spark, fresh, "p = 2")
    got = t.read(spark)
    assert got.filter("p = 2").count() == 1
    assert got.count() == 16
    # partition pruning still works on the rewritten layout
    assert _rows(got.filter("p = 2").select("id")) == [(100,)]


def test_additive_schema_merge_on_insert(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 5)], ["id", "day"]))
    fresh = spark.createDataFrame(
        [(2, 5, "x")], ["id", "day", "note"]
    )
    t.replace_where(spark, fresh, "day = 5", validate=False)
    got = t.read(spark)
    assert set(got.columns) == {"id", "day", "note"}
    assert _rows(got.select("id", "note")) == [(2, "x")]


def test_constraint_checked_on_inserted_rows(spark, tmp_path):
    from bigdataingestion_spark.sinks.txlog import ConstraintViolationError

    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "pos_id", "id >= 0")
    bad = spark.createDataFrame([(-5, 3)], ["id", "day"]).withColumn(
        "day", F.col("day").cast("bigint")
    )
    with pytest.raises(ConstraintViolationError):
        t.replace_where(spark, bad, "day = 3")
