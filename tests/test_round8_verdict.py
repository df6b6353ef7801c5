"""Round-8 self-directed verifications: the checkpoint-rebase advice the
stream's rename refusals give must actually work — recover_cdf_replica
re-bases a replica across a (nested) column rename and ordinary
replication resumes against the same checkpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from bigdataingestion_spark.sinks.txlog import TxLogTable
from bigdataingestion_spark.sources.txlog_datasource import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _rows(spark, t):
    return sorted((r.id, r.s.postal if r.s else None) for r in t.read(spark).collect())


def test_recover_cdf_replica_across_nested_rename(spark, tmp_path):
    """A micro-batch range spanning a NESTED rename wedges under either
    schema (the refusal says so and names this helper); recovery
    re-bases the replica at the post-rename snapshot — new schema, new
    checkpoint identity — and the ordinary feed keeps working after."""
    from bigdataingestion_spark.streaming.ingest import (
        recover_cdf_replica,
        stream_cdf_replicate,
    )

    src_path, dst_path, ck = (
        str(tmp_path / "src"),
        str(tmp_path / "dst"),
        str(tmp_path / "ck"),
    )
    src = TxLogTable(src_path)
    src.append(
        spark.createDataFrame(
            [(1, Row(zip="90210"))], "id long, s struct<zip:string>"
        )
    )
    src.alter_properties({"cdf.enabled": "true"})
    src.append(
        spark.createDataFrame(
            [(2, Row(zip="10001"))], "id long, s struct<zip:string>"
        )
    )
    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    dst = TxLogTable(dst_path)
    assert sorted(
        (r.id, r.s.zip) for r in dst.read(spark).collect()
    ) == [(1, "90210"), (2, "10001")]

    src.enable_column_mapping()
    src.rename_column("s.zip", "postal")
    src.append(
        spark.createDataFrame(
            [(3, Row(postal="60601"))], "id long, s struct<postal:string>"
        )
    )

    # the plain feed wedges on the rename-spanning range and prescribes
    # the rebase; the replica is untouched
    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    with pytest.raises(Exception, match="Rebase the checkpoint"):
        q.awaitTermination(240)
        q.stop()
        raise RuntimeError(q.exception() or "batch unexpectedly succeeded")
    assert sorted(
        (r.id, r.s.zip) for r in dst.read(spark).collect()
    ) == [(1, "90210"), (2, "10001")]

    # recovery re-bases: replica carries the POST-rename schema and rows
    q = recover_cdf_replica(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    assert _rows(spark, dst) == _rows(spark, src) == [
        (1, "90210"),
        (2, "10001"),
        (3, "60601"),
    ]
    assert dst.read(spark).schema["s"].dataType.fieldNames() == ["postal"]

    # and the ordinary feed keeps working against the same checkpoint
    src.delete(spark, "id = 1")
    src.append(
        spark.createDataFrame(
            [(4, Row(postal="02134"))], "id long, s struct<postal:string>"
        )
    )
    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    assert _rows(spark, dst) == _rows(spark, src) == [
        (2, "10001"),
        (3, "60601"),
        (4, "02134"),
    ]


def test_read_cdf_spanning_nested_rename_merges_eras(spark, tmp_path):
    """The batch CDF reads each commit under ITS OWN schema and unions
    by name: a range spanning a nested rename yields each era's values
    under that era's nested name (nulls elsewhere) — same contract
    top-level renames already get, no error, no silent remap."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, Row(zip="a"))], "id long, s struct<zip:string>"
        )
    )
    t.alter_properties({"cdf.enabled": "true"})
    t.enable_column_mapping()
    t.rename_column("s.zip", "postal")
    t.append(
        spark.createDataFrame(
            [(2, Row(postal="b"))], "id long, s struct<postal:string>"
        )
    )
    chg = t.read_cdf(spark, from_version=-1)
    got = sorted(
        (r.id, r.s.zip, r.s.postal, r._change_type) for r in chg.collect()
    )
    assert got == [(1, "a", None, "insert"), (2, None, "b", "insert")]


def test_generated_chain_refused_in_both_directions(spark, tmp_path):
    """Review finding: the chain guard must also fire when declaring an
    EXISTING column generated while another generated expression already
    READS it (the back-door chain)."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, bucket bigint"))
    t.add_generated_column(spark, "flag", "bucket % 7")  # bucket is plain
    with pytest.raises(ValueError, match="already derive"):
        t.add_generated_column(spark, "bucket", "id % 24")


def test_nullability_only_schema_change_does_not_wedge_stream(
    spark, tmp_path
):
    """Review finding: a mapped overwrite recommits F.struct() output
    whose nested fields are always nullable; a stream spanning that
    commit must read through (nullability is not a layout property),
    not misreport an unrecoverable nested RENAME."""
    from pyspark.sql import functions as F

    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, Row(zip="a"))], "id long, s struct<zip:string>"
        ).select(
            "id", F.struct(F.col("s.zip").alias("zip")).alias("s")
        )
    )
    t.enable_column_mapping()
    # overwrite with a non-nullable nested field declaration: same
    # names, same leaf types, flipped nullability
    t.overwrite(
        spark.createDataFrame(
            [(2, Row(zip="b"))],
            "id long, s struct<zip:string> not null",
        )
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("txlog")
        .option("allowRewrites", "true")  # the overwrite is the point
        .load(t.path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted((r.id, r.s.zip) for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (2, "b")]


def test_identity_nested_map_is_translation_free(spark, tmp_path):
    """Review finding: a mapped struct table that was never nested-
    renamed (or whose nested fields carry incidental metadata) must not
    pay the rebuild/cast translation — the read plan projects the scan
    columns directly."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, Row(zip="a"))], "id long, s struct<zip:string>"
        )
    )
    t.enable_column_mapping()
    plan = (
        t.read(spark)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "CASE WHEN" not in plan and "struct(" not in plan, plan
    t.rename_column("s.zip", "postal")
    plan2 = (
        t.read(spark)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "CASE WHEN" in plan2, plan2


def test_partitioned_shallow_clone_failure_cleans_up(
    spark, tmp_path, monkeypatch
):
    """Review finding: a mid-loop symlink failure must undo the partial
    layout (else a retry wedges on FileExistsError) and not blame the
    filesystem for unrelated errors."""
    import os as _os

    src = TxLogTable(str(tmp_path / "src"))
    src.overwrite_partitions(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], ["id", "part", "value"]
        ),
        ["part"],
    )
    real, calls = _os.symlink, []

    def flaky(s, d):
        calls.append(d)
        if len(calls) == 2:
            raise OSError(28, "No space left on device")
        return real(s, d)

    monkeypatch.setattr(_os, "symlink", flaky)
    with pytest.raises(ValueError, match="could not symlink"):
        src.clone_to(spark, str(tmp_path / "c1"))
    monkeypatch.setattr(_os, "symlink", real)
    assert not _os.path.exists(calls[0])  # partial layout undone
    clone = src.clone_to(spark, str(tmp_path / "c1"))  # retry succeeds
    assert sorted(r.id for r in clone.read(spark).collect()) == [1, 2]
