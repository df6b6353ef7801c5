"""Identity columns (GENERATED ALWAYS/BY DEFAULT AS IDENTITY) on txlog
tables: table-allocated unique BIGINT values with a transactional
high-water mark in the table properties — the property conflict rule is
what makes two racing allocators physically unable to both commit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.merge_clauses import (
    MergeClauseError,
    when_matched_update,
    when_not_matched_insert,
)
from bigdataingestion_spark.sinks.txlog import (
    ConcurrentWriteError,
    IdentityColumnViolationError,
    TxLogTable,
)


def _ids(t, spark, col="id"):
    return [r[0] for r in t.read(spark).select(col).collect()]


def _fresh(spark, tmp_path, name="t", always=True, start=1, step=1):
    t = TxLogTable(str(tmp_path / name))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id", start=start, step=step, always=always)
    return t


def test_always_allocates_unique_monotonic_across_appends(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    t.append(spark.createDataFrame([("a",), ("b",), ("c",)], ["v"]))
    first = sorted(_ids(t, spark))
    assert first == [1, 2, 3]
    t.append(spark.createDataFrame([("d",), ("e",)], ["v"]))
    ids = _ids(t, spark)
    assert len(ids) == len(set(ids)) == 5
    assert max(ids) >= 5 and min(ids) == 1
    assert t.snapshot().properties["identity.hwm.id"] == str(max(ids))


def test_always_refuses_supplied_values(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    with pytest.raises(IdentityColumnViolationError, match="ALWAYS"):
        t.append(spark.createDataFrame([(99, "a")], ["id", "v"]))


def test_by_default_fills_nulls_and_tracks_supplied(spark, tmp_path):
    t = _fresh(spark, tmp_path, always=False)
    t.append(
        spark.createDataFrame(
            [(500, "sup"), (None, "alloc")], "id bigint, v string"
        )
    )
    got = {r["v"]: r["id"] for r in t.read(spark).collect()}
    assert got["sup"] == 500 and got["alloc"] is not None
    # the mark accounts the SUPPLIED extreme: later allocation cannot
    # collide with 500
    assert int(t.snapshot().properties["identity.hwm.id"]) == 500
    t.append(spark.createDataFrame([(None, "next")], "id bigint, v string"))
    nxt = {r["v"]: r["id"] for r in t.read(spark).collect()}["next"]
    assert nxt > 500


def test_multi_partition_allocation_is_unique(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    batch = spark.createDataFrame(
        [(f"v{i}",) for i in range(500)], ["v"]
    ).repartition(8)
    t.append(batch)
    ids = _ids(t, spark)
    assert len(ids) == 500 and len(set(ids)) == 500
    assert min(ids) == 1 and max(ids) == 500  # one slot per row, one batch


def test_start_step_and_negative_step(spark, tmp_path):
    t = _fresh(spark, tmp_path, start=100, step=10)
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    assert sorted(_ids(t, spark)) == [100, 110]
    tneg = _fresh(spark, tmp_path, name="tneg", start=-1, step=-2)
    tneg.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    assert sorted(_ids(tneg, spark)) == [-3, -1]
    tneg.append(spark.createDataFrame([("c",)], ["v"]))
    assert min(_ids(tneg, spark)) == -5


def test_declare_on_existing_column_sets_mark_past_max(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(7, "a"), (42, "b")], "id bigint, v string")
    )
    t.add_identity_column(spark, "id", always=True)
    assert t.snapshot().properties["identity.hwm.id"] == "42"
    t.append(spark.createDataFrame([("c",)], ["v"]))
    assert sorted(_ids(t, spark)) == [7, 42, 43]


def test_declaration_refusals(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "a", None)], "n int, v string, holey bigint"
        )
    )
    # non-BIGINT column
    with pytest.raises(IdentityColumnViolationError, match="BIGINT"):
        t.add_identity_column(spark, "n")
    # column holding NULLs
    with pytest.raises(IdentityColumnViolationError, match="NULL"):
        t.add_identity_column(spark, "holey")
    # NEW column on a non-empty table
    with pytest.raises(ValueError, match="non-empty"):
        t.add_identity_column(spark, "fresh_id")
    # zero step
    with pytest.raises(ValueError, match="non-zero"):
        t.add_identity_column(spark, "holey", step=0)
    # generated + identity mutual exclusion
    t2 = TxLogTable(str(tmp_path / "t2"))
    t2.append(spark.createDataFrame([], "g bigint, v string"))
    t2.add_generated_column(spark, "g", "cast(length(v) as bigint)")
    with pytest.raises(ValueError, match="generated"):
        t2.add_identity_column(spark, "g")


def test_sync_identity_repairs_mark(spark, tmp_path):
    t = _fresh(spark, tmp_path, always=False)
    t.append(spark.createDataFrame([(None, "a")], "id bigint, v string"))
    # simulate an out-of-band mark regression, then SYNC repairs it
    props = dict(t.snapshot().properties)
    t.alter_properties({"identity.hwm.id": "0"})
    t.sync_identity(spark, "id")
    assert t.snapshot().properties["identity.hwm.id"] == props[
        "identity.hwm.id"
    ]
    with pytest.raises(ValueError, match="not an identity column"):
        t.sync_identity(spark, "v")


def test_overwrite_continues_the_mark(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    t.overwrite(spark.createDataFrame([("z",)], ["v"]))
    ids = _ids(t, spark)
    # the overwritten row's id continues past the pre-overwrite mark:
    # truncation never resets identity (Delta's contract)
    assert ids[0] > 2
    # and the IDENTITY declaration survived the schema replacement
    with pytest.raises(IdentityColumnViolationError, match="ALWAYS"):
        t.append(spark.createDataFrame([(1, "x")], "id bigint, v string"))


def test_merge_allocates_on_insert_carries_on_update(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    id_a = {r["v"]: r["id"] for r in t.read(spark).collect()}["a"]
    src = spark.createDataFrame(
        [("a", "A"), ("c", "C")], ["v", "v_new"]
    )
    t.merge(
        spark, src, ["v"],
        [
            when_matched_update(set={"v": "s.v_new"}),
            when_not_matched_insert(values={"v": "s.v_new"}),
        ],
    )
    got = {r["v"]: r["id"] for r in t.read(spark).collect()}
    assert got["A"] == id_a  # updated row KEEPS its identity
    assert got["C"] is not None and got["C"] > 2  # insert allocated
    # identity is never assignable through merge clauses
    with pytest.raises(MergeClauseError, match="identity"):
        t.merge(
            spark, src, ["v"],
            [when_matched_update(set={"id": "1"})],
        )


def test_merge_upsert_and_commit_files_refuse_identity_tables(
    spark, tmp_path
):
    t = _fresh(spark, tmp_path)
    t.append(spark.createDataFrame([("a",)], ["v"]))
    with pytest.raises(IdentityColumnViolationError, match="merge_upsert"):
        t.merge_upsert(
            spark, spark.createDataFrame([("a",)], ["v"]), keys=["v"]
        )
    with pytest.raises(IdentityColumnViolationError, match="externally"):
        t.commit_files([], t.read(spark).schema)


def test_concurrent_identity_appends_cannot_both_commit(spark, tmp_path):
    """Two writers allocating from the same mark: the loser's commit must
    fail (its values would collide with the winner's), then succeed with
    fresh values on retry."""
    path = str(tmp_path / "t")
    t1, t2 = TxLogTable(path), TxLogTable(path)
    t1.append(spark.createDataFrame([], "id bigint, v string"))
    t1.add_identity_column(spark, "id")
    # freeze t1's view of the table, then let t2 allocate and commit
    stale = t1.snapshot()
    real = t1.snapshot
    first = {"pending": True}

    def fake(version=None):
        # only the op-entry snapshot is stale; the reconcile loop's
        # re-snapshot must see the real table (as a real racer would)
        if version is None and first["pending"]:
            first["pending"] = False
            return stale
        return real(version)

    t1.snapshot = fake
    t2.append(spark.createDataFrame([("w1",), ("w2",)], ["v"]))
    with pytest.raises(ConcurrentWriteError, match="properties"):
        t1.append(spark.createDataFrame([("l1",)], ["v"]))
    t1.snapshot = real
    t1.append(spark.createDataFrame([("l1",)], ["v"]))  # retry reallocates
    ids = _ids(t1, spark)
    assert len(ids) == 3 and len(set(ids)) == 3


def test_writer_feature_recorded(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    feats = [
        e.get("features", {}).get("writer", []) for e in t.history()
    ]
    assert any("identityColumns" in w for w in feats)
    t.append(spark.createDataFrame([("a",)], ["v"]))
    assert "identityColumns" in t.history()[-1]["features"]["writer"]


def test_update_refuses_identity_assignment(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    t.append(spark.createDataFrame([("a",)], ["v"]))
    with pytest.raises(IdentityColumnViolationError, match="UPDATE SET"):
        t.update(spark, "v = 'a'", {"id": "99"})
    # updating OTHER columns on an identity table stays fine
    t.update(spark, "v = 'a'", {"v": "'A'"})
    assert [r["v"] for r in t.read(spark).collect()] == ["A"]


def test_replace_where_allocates_for_inserted_rows(spark, tmp_path):
    t = _fresh(spark, tmp_path)
    t.append(
        spark.createDataFrame([("keep",), ("swap",)], ["v"])
    )
    hwm0 = int(t.snapshot().properties["identity.hwm.id"])
    t.replace_where(
        spark,
        spark.createDataFrame([("swapped",)], ["v"]),
        "v like 'swap%'",
    )
    got = {r["v"]: r["id"] for r in t.read(spark).collect()}
    assert got["swapped"] > hwm0  # fresh allocation, kept row untouched
    assert len(set(got.values())) == 2


def test_clone_carries_identity_mark_and_contract(spark, tmp_path):
    """CLONE carries the table properties, so a clone's allocator
    continues past the source's mark instead of re-issuing cloned ids;
    the GENERATED ALWAYS contract survives too."""
    t = _fresh(spark, tmp_path)
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    c = t.clone_to(spark, str(tmp_path / "c"), shallow=True)
    assert c.snapshot().properties["identity.hwm.id"] == "2"
    c.append(spark.createDataFrame([("c",)], ["v"]))
    assert sorted(_ids(c, spark)) == [1, 2, 3]
    with pytest.raises(IdentityColumnViolationError, match="ALWAYS"):
        c.append(spark.createDataFrame([(9, "x")], "id bigint, v string"))
    # the source is untouched by the clone's allocation
    assert t.snapshot().properties["identity.hwm.id"] == "2"
