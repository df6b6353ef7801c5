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
