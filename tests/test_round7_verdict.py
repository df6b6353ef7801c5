"""Round-7 verdict items: stream contract under source schema evolution
(refuse mid-stream, converge after restart) and the snapshot-restart
recovery path for replicas whose source was RESTOREd."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdataingestion_spark.sinks.txlog import TxLogTable


def _rows(spark, t):
    return sorted(tuple(r) for r in t.read(spark).collect())


# ------------------------------------ schema evolution: the contract --


def test_stream_reader_refuses_mid_stream_schema_evolution(spark, tmp_path):
    """A commit carrying a column the running stream's fixed schema lacks
    must fail the batch (the per-file read would silently project the new
    column away), while a RESTARTED stream — wider schema — re-reads the
    same range fine."""
    from bigdataingestion_spark.sources.txlog_datasource import (
        _TxLogStreamReader,
    )

    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))  # v0
    t.alter_properties({"cdf.enabled": "true"})  # v1
    old_schema = StructType.fromJson(
        __import__("json").loads(t.snapshot().schema_json)
    )
    t.append(
        spark.createDataFrame([(2, "b", 7)], ["id", "v", "w"])
    )  # v2: additive evolution

    # plain rows-added stream, schema fixed pre-evolution
    rd = _TxLogStreamReader({"path": path}, old_schema)
    with pytest.raises(ValueError, match="schema changed at v2"):
        rd.partitions({"version": -1}, {"version": 2})

    # CDF stream, schema fixed pre-evolution
    cdf_schema = StructType(
        list(old_schema.fields)
        + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", LongType()),
        ]
    )
    rd = _TxLogStreamReader(
        {"path": path, "readChangeFeed": "true"}, cdf_schema
    )
    with pytest.raises(ValueError, match="schema changed at v2"):
        rd.partitions({"version": -1}, {"version": 2})

    # a restarted stream resolves the evolved schema: same range, no error
    # (older narrower commits project under the wider schema with nulls)
    new_schema = StructType.fromJson(
        __import__("json").loads(t.snapshot().schema_json)
    )
    rd = _TxLogStreamReader({"path": path}, new_schema)
    assert len(rd.partitions({"version": -1}, {"version": 2})) == 2


def test_cdf_replicate_converges_after_schema_evolution(spark, tmp_path):
    """End-to-end: replicate, evolve the source additively, replicate
    again — the fresh query resolves the evolved schema, the replica
    widens on the evolution commit's insert (append merge-schema), and
    post-evolution DML applies cleanly."""
    from bigdataingestion_spark.streaming.ingest import stream_cdf_replicate

    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")

    src = TxLogTable(src_path)
    src.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    src.alter_properties({"cdf.enabled": "true"})

    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    dst = TxLogTable(dst_path)
    assert _rows(spark, dst) == _rows(spark, src)

    # additive evolution + post-evolution DML in the same catch-up run
    src.append(spark.createDataFrame([(3, "c", 30)], ["id", "v", "w"]))
    src.update(spark, "id = 1", {"v": "'UP'"})
    src.delete(spark, "id = 2")

    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    assert [f.name for f in dst.read(spark).schema.fields] == [
        "id",
        "v",
        "w",
    ]
    assert _rows(spark, dst) == _rows(spark, src)


# -------------------------------------------- restore recovery path --


def test_recover_cdf_replica_after_source_restore(spark, tmp_path):
    """The CDF stream refuses a restore commit and prescribes a snapshot
    restart; recover_cdf_replica IS that path — re-base the replica at a
    pinned snapshot, forget the pre-restore offset, resume the feed —
    and ordinary replication keeps working afterwards."""
    from bigdataingestion_spark.streaming.ingest import (
        recover_cdf_replica,
        stream_cdf_replicate,
    )

    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")

    src = TxLogTable(src_path)
    src.append(spark.createDataFrame([(1, "a")], ["id", "v"]))  # v0
    src.alter_properties({"cdf.enabled": "true"})  # v1
    src.append(spark.createDataFrame([(2, "b")], ["id", "v"]))  # v2

    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    dst = TxLogTable(dst_path)
    assert _rows(spark, dst) == [(1, "a"), (2, "b")]

    src.restore(2 - 2)  # back to v0: only (1, a)  -> v3
    src.append(spark.createDataFrame([(9, "z")], ["id", "v"]))  # v4

    # the plain feed refuses the restore commit, replica untouched
    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    with pytest.raises(Exception, match="restore"):
        q.awaitTermination(240)
        q.stop()
        raise RuntimeError(q.exception() or "batch unexpectedly succeeded")
    assert _rows(spark, dst) == [(1, "a"), (2, "b")]

    # recovery re-bases and reconverges
    q = recover_cdf_replica(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    assert _rows(spark, dst) == _rows(spark, src) == [(1, "a"), (9, "z")]

    # idempotent: re-running recovery converges to the same state
    q = recover_cdf_replica(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    assert _rows(spark, dst) == [(1, "a"), (9, "z")]

    # and the ordinary feed keeps working against the same checkpoint
    src.append(spark.createDataFrame([(10, "y")], ["id", "v"]))
    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    assert _rows(spark, dst) == _rows(spark, src)
