"""Regressions for the round-9 adversarial review findings on the new
conditional-MERGE and identity-column subsystems."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType, LongType

from bigdataingestion_spark.sinks.merge_clauses import (
    MergeCardinalityError,
    MergeClauseError,
    MergePlan,
    when_matched_delete,
    when_matched_update,
    when_not_matched_by_source_delete,
    when_not_matched_insert,
)
from bigdataingestion_spark.sinks.txlog import (
    IdentityColumnViolationError,
    TxLogTable,
)


def test_dup_source_keys_with_by_source_clause_refused(spark, tmp_path):
    """Finding 1: a by-source rewrite re-stages matched rows as CARRY;
    with duplicate source keys the full-outer fan-out would silently
    DUPLICATE them — the cardinality guard must fire even without
    matched clauses."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).coalesce(1)
    )
    src = spark.createDataFrame([(1, "x"), (1, "y")], ["id", "v"])
    with pytest.raises(MergeCardinalityError):
        t.merge(
            spark, src, ["id"],
            [when_not_matched_by_source_delete()],
        )
    # table unchanged — and in particular NOT duplicated
    assert t.read(spark).count() == 2
    # insert-only merges stay exempt (carry rows are never re-staged;
    # duplicate source keys insert, Delta's contract)
    src2 = spark.createDataFrame([(9, "x"), (9, "y")], ["id", "v"])
    t.merge(spark, src2, ["id"], [when_not_matched_insert()])
    assert t.read(spark).count() == 4


def test_overwrite_partitions_enforces_identity(spark, tmp_path):
    """Finding 2: the partitioned write path allocates and refuses
    exactly like the flat paths."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "rid bigint, v string, p string"))
    t.add_identity_column(spark, "rid")
    t.overwrite_partitions(
        spark.createDataFrame([("a", "x"), ("b", "y")], ["v", "p"]),
        ["p"],
    )
    ids = [r["rid"] for r in t.read(spark).collect()]
    assert sorted(ids) == [1, 2]
    assert t.snapshot().properties["identity.hwm.rid"] == "2"
    # a second partition-overwrite continues the mark
    t.overwrite_partitions(
        spark.createDataFrame([("c", "y")], ["v", "p"]), ["p"]
    )
    ids = [r["rid"] for r in t.read(spark).collect()]
    assert len(set(ids)) == 2 and max(ids) == 3  # p=y replaced, p=x kept
    # GENERATED ALWAYS refuses supplied values here too
    with pytest.raises(IdentityColumnViolationError, match="ALWAYS"):
        t.overwrite_partitions(
            spark.createDataFrame(
                [(99, "d", "z")], "rid bigint, v string, p string"
            ),
            ["p"],
        )


def test_generated_identity_dependency_refused_both_ways(spark, tmp_path):
    """Finding 3: generation expressions evaluate BEFORE identity
    allocation, so a generated column deriving from an identity column
    would read pre-allocation NULLs — refused at declaration time in
    both directions."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    with pytest.raises(ValueError, match="identity"):
        t.add_generated_column(spark, "bucket", "id % 10")

    t2 = TxLogTable(str(tmp_path / "t2"))
    t2.append(spark.createDataFrame([], "id bigint, bucket bigint"))
    t2.add_generated_column(spark, "bucket", "id % 10")
    with pytest.raises(ValueError, match="pre-allocation"):
        t2.add_identity_column(spark, "id")


def test_scoping_check_ignores_string_literals(spark, tmp_path):
    """Finding 5: 't.'/'s.' inside string literals must not trip the
    alias-scoping refusal, and the check is case-insensitive."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "http://t.co")], ["id", "url"]))
    src = spark.createDataFrame([(2, "http://t.co")], ["id", "url"])
    # literal 't.co' in an insert condition: accepted and evaluated
    t.merge(
        spark, src, ["id"],
        [when_not_matched_insert(condition="url != 'http://other.example'")],
    )
    assert t.read(spark).count() == 2
    with pytest.raises(MergeClauseError, match="bare source"):
        t.merge(
            spark, src, ["id"],
            [when_not_matched_insert(condition="T.url = 'x'")],
        )


def test_merge_plan_delete_clause_with_disjoint_source():
    """Finding 4: a delete clause also carries assignments=None but never
    maps columns — the disjoint-source SET*/INSERT* refusal must not
    fire for it (MergePlan is the module's exported API even though
    Table.merge's key check makes this unreachable there)."""
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("v", StringType()),
        ]
    )
    plan = MergePlan(
        clauses=[when_matched_delete()],
        schema=schema,
        target_cols=["id", "v"],
        source_cols=["other_a", "other_b"],
        generated={},
    )
    assert plan.delete_codes() == {"m0"}
    # ... while a genuine SET * with a fully-disjoint source still refuses
    with pytest.raises(MergeClauseError, match="SET"):
        MergePlan(
            clauses=[when_matched_update()],
            schema=schema,
            target_cols=["id", "v"],
            source_cols=["other_a"],
            generated={},
        )


def test_identity_allocation_single_metadata_job(spark, tmp_path):
    """Finding 6: the fold keeps allocation correct — per-partition
    offsets, null counts, and the supplied extreme from one
    aggregation (BY DEFAULT mixed batch, multiple partitions)."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id", always=False)
    rows = [(900, "s0")] + [(None, f"a{i}") for i in range(20)]
    t.append(
        spark.createDataFrame(rows, "id bigint, v string").repartition(4)
    )
    got = [r["id"] for r in t.read(spark).collect()]
    assert len(got) == 21 and len(set(got)) == 21
    assert 900 in got
    assert int(t.snapshot().properties["identity.hwm.id"]) == 900


def test_in_commit_timestamps_monotonic_under_clock_regression(
    spark, tmp_path, monkeypatch
):
    """Commit timestamps are max(wall clock, predecessor + 1ms), so
    version order and timestamp order can never disagree — Delta's
    in-commit-timestamps guarantee, default-on. A clock stepping
    BACKWARD between commits must not make timestampAsOf resolve to the
    wrong snapshot."""
    import time as _time

    from bigdataingestion_spark.sinks import txlog as txmod

    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1,)], ["id"]))
    ts0 = t.history()[-1]["ts"]
    # the writer's clock regresses by an hour
    real = _time.time
    monkeypatch.setattr(txmod.time, "time", lambda: real() - 3600)
    t.append(spark.createDataFrame([(2,)], ["id"]))
    monkeypatch.setattr(txmod.time, "time", real)
    t.append(spark.createDataFrame([(3,)], ["id"]))
    stamps = [e["ts"] for e in t.history()]
    assert stamps == sorted(stamps)
    assert stamps[1] == pytest.approx(ts0 + 0.001)
    # timestampAsOf at the regressed wall-clock instant resolves to the
    # version order, not the lying clock
    assert t.version_at_timestamp(ts0) == 0
    assert t.version_at_timestamp(stamps[1]) == 1
    assert t.read(spark, timestamp=stamps[1]).count() == 2


def test_merge_by_default_identity_passes_supplied_values(spark, tmp_path):
    """Pass 2: BY DEFAULT identity behaves like append in MERGE — a
    source-supplied value passes through INSERT * (cross-system ids must
    not silently vanish); NULL slots still allocate; ALWAYS still forces
    allocation and refuses assignment."""
    from bigdataingestion_spark.sinks.merge_clauses import (
        when_not_matched_insert,
    )

    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "rid bigint, v string"))
    t.add_identity_column(spark, "rid", always=False)
    t.append(spark.createDataFrame([(None, "a")], "rid bigint, v string"))
    src = spark.createDataFrame(
        [(100, "sup"), (None, "alloc")], "rid bigint, v string"
    )
    t.merge(spark, src, ["v"], [when_not_matched_insert()])
    got = {r["v"]: r["rid"] for r in t.read(spark).collect()}
    assert got["sup"] == 100          # supplied value passed through
    assert got["alloc"] is not None   # NULL slot allocated
    assert int(t.snapshot().properties["identity.hwm.rid"]) == 100
    # explicit assignment is allowed for BY DEFAULT (append parity)
    src2 = spark.createDataFrame([("x2",)], ["v"])
    t.merge(
        spark, src2, ["v"],
        [when_not_matched_insert(values={"v": "s.v", "rid": "200"})],
    )
    assert {r["rid"] for r in t.read(spark).filter("v='x2'").collect()} == {
        200
    }


def test_auto_compact_property_validation(spark, tmp_path):
    """Pass 2: '0'/garbage auto-compact settings refuse at
    alter_properties instead of silently compacting every write or
    silently disabling."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1,)], ["id"]))
    with pytest.raises(ValueError, match="positive integer"):
        t.alter_properties({"auto.compact.min.files": "0"})
    with pytest.raises(ValueError):
        t.alter_properties({"auto.compact.min.files": "ten"})
    with pytest.raises(ValueError, match="positive integer"):
        t.alter_properties({"auto.compact.target.bytes": "-5"})


def test_auto_compact_covers_delete_and_partition_overwrite(spark, tmp_path):
    """Pass 2: every fragmenting write path triggers the maintenance
    check — a DV delete (masked files are always pack candidates) and
    partition overwrites included."""
    t = TxLogTable(str(tmp_path / "t"))
    for i in range(4):
        t.append(spark.createDataFrame([(i, "x")], ["id", "v"]).coalesce(1))
    t.alter_properties({"auto.compact.min.files": "4"})
    t.delete(spark, "id = 0", deletion_vectors=True)
    assert t.history()[-1]["op"] == "compact"
    assert len(t.snapshot().files) == 1
    assert t.read(spark).count() == 3
    assert not t.snapshot().dvs  # the purge retired the mask


def test_struct_column_named_t_is_referencable(spark, tmp_path):
    """Pass 2: a source struct literally named 't' makes 't.flag' a
    legitimate bare reference in an insert condition — the alias guard
    stands down when the side really has that column."""
    from bigdataingestion_spark.sinks.merge_clauses import (
        when_not_matched_insert,
    )

    t = TxLogTable(str(tmp_path / "tbl"))
    t.append(
        spark.createDataFrame([(1, (True,))], "id bigint, t struct<flag:boolean>")
    )
    src = spark.createDataFrame(
        [(2, (True,)), (3, (False,))], "id bigint, t struct<flag:boolean>"
    )
    t.merge(
        spark, src, ["id"],
        [when_not_matched_insert(condition="t.flag = true")],
    )
    assert sorted(r["id"] for r in t.read(spark).collect()) == [1, 2]


def test_identity_redeclare_refused_case_insensitively(spark, tmp_path):
    """Pass 2: re-declaring an identity column whose stored name has
    uppercase must refuse, not silently replace the spec and rewind the
    mark."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "RowId bigint, v string"))
    t.add_identity_column(spark, "RowId")
    with pytest.raises(ValueError, match="already an identity"):
        t.add_identity_column(spark, "RowId")
    with pytest.raises(ValueError, match="already an identity"):
        t.add_identity_column(spark, "rowid")


def test_cdc_feed_with_rn_column_survives(spark, tmp_path):
    """Pass 2: the CDC apply's dedup helper uses a fresh name — a feed
    column literally named _rn must land intact."""
    from bigdataingestion_spark.streaming.ingest import stream_cdc_apply_ops

    src = tmp_path / "src"
    spark.createDataFrame(
        [(1, "a", 7, "I", 1)], "k bigint, val string, _rn int, op string, seq int"
    ).coalesce(1).write.parquet(str(src))
    q = stream_cdc_apply_ops(
        spark, str(src), str(tmp_path / "state"), str(tmp_path / "ckpt"),
        keys=["k"], op_col="op", order_cols=["seq"],
    )
    assert q.awaitTermination(120)
    row = TxLogTable(str(tmp_path / "state")).read(spark).first()
    assert row["_rn"] == 7
