"""Round-7 advisory regressions: CDF-replication bootstrap pinning and
duplicate-key DML enforcement (streaming/ingest.py), batch-reader
time-travel clamp parity (sources/txlog_datasource.py), and the
session-timezone gate on TIMESTAMP-literal data skipping
(sinks/skipping.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from bigdataingestion_spark.sinks.skipping import candidate_files
from bigdataingestion_spark.sinks.txlog import TxLogTable


# ------------------------------------------------ bootstrap TOCTOU --


def test_bootstrap_reads_pinned_version_not_latest(
    spark, tmp_path, monkeypatch
):
    """A source commit landing between bootstrap's version() probe and
    its snapshot read must NOT be both copied into the bootstrap and
    re-delivered by the feed. Simulated deterministically: version() is
    made to report one version older than the snapshot on its first
    call, exactly the state a racing writer produces."""
    from bigdataingestion_spark.streaming.ingest import stream_cdf_replicate

    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")

    src = TxLogTable(src_path)
    src.append(spark.createDataFrame([(1, "a")], ["id", "v"]))  # v0
    src.alter_properties({"cdf.enabled": "true"})  # v1
    src.append(spark.createDataFrame([(2, "b")], ["id", "v"]))  # v2

    real_version = TxLogTable.version
    raced = []

    def race_version(self):
        v = real_version(self)
        if not raced and os.path.abspath(self.path) == os.path.abspath(
            src_path
        ):
            raced.append(1)
            return v - 1  # bootstrap "saw" v1; v2 is the racing commit
        return v

    monkeypatch.setattr(TxLogTable, "version", race_version)
    q = stream_cdf_replicate(
        spark, src_path, dst_path, ck, keys=["id"], bootstrap=True
    )
    assert q.awaitTermination(240), "replication batch timed out"
    monkeypatch.undo()

    dst = TxLogTable(dst_path)
    got = sorted((r.id, r.v) for r in dst.read(spark).collect())
    # unpinned bootstrap copies [(1,a),(2,b)] then the feed re-appends
    # (2,b) -> [(1,a),(2,b),(2,b)]; pinned bootstrap converges exactly
    assert got == [(1, "a"), (2, "b")]


# ------------------------------------- duplicate-key DML enforcement --


def test_cdf_replicate_fails_dml_on_duplicated_replica_keys(
    spark, tmp_path
):
    """Key-based delete/update cannot tell which row of a duplicated key
    group changed: a source DELETE matching only one of two id=7 rows
    must fail the batch loudly (the old behavior silently removed BOTH
    replica rows and diverged forever)."""
    from bigdataingestion_spark.streaming.ingest import stream_cdf_replicate

    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")

    src = TxLogTable(src_path)
    src.append(
        spark.createDataFrame(
            [(7, "g"), (7, "g2"), (8, "h")], ["id", "v"]
        )
    )
    src.alter_properties({"cdf.enabled": "true"})

    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    dst = TxLogTable(dst_path)
    assert sorted((r.id, r.v) for r in dst.read(spark).collect()) == [
        (7, "g"),
        (7, "g2"),
        (8, "h"),
    ]
    v_before = dst.version()

    src.delete(spark, "v = 'g'")  # touches ONE row of the dup group
    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    with pytest.raises(Exception, match="duplicated on the replica"):
        q.awaitTermination(240)
        q.stop()
        raise RuntimeError(q.exception() or "batch unexpectedly succeeded")
    # nothing was applied: the guard runs BEFORE any step of the version
    assert dst.version() == v_before
    assert sorted((r.id, r.v) for r in dst.read(spark).collect()) == [
        (7, "g"),
        (7, "g2"),
        (8, "h"),
    ]


def test_cdf_replicate_dml_on_unique_key_with_dups_elsewhere(
    spark, tmp_path
):
    """The guard is scoped to the keys the DML touches: deleting a
    UNIQUE key on a replica that holds duplicates elsewhere still
    converges, dups preserved."""
    from bigdataingestion_spark.streaming.ingest import stream_cdf_replicate

    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")

    src = TxLogTable(src_path)
    src.append(
        spark.createDataFrame(
            [(7, "g"), (7, "g2"), (8, "h")], ["id", "v"]
        )
    )
    src.alter_properties({"cdf.enabled": "true"})
    src.delete(spark, "id = 8")

    q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
    assert q.awaitTermination(240)
    dst = TxLogTable(dst_path)
    assert sorted((r.id, r.v) for r in dst.read(spark).collect()) == [
        (7, "g"),
        (7, "g2"),
    ]


# ------------------------------------------- time-travel clamp parity --


def test_datasource_version_beyond_latest_raises(spark, tmp_path):
    """option("version", N) with N past the latest commit must raise like
    the native TxLogTable.read — not silently clamp to HEAD."""
    from bigdataingestion_spark.sources import txlog_datasource

    txlog_datasource.register(spark)
    path = str(tmp_path / "t")
    t = TxLogTable(path)
    t.append(spark.createDataFrame([(1,)], ["id"]))  # v0
    t.append(spark.createDataFrame([(2,)], ["id"]))  # v1

    # the exact latest version still reads fine
    assert (
        spark.read.format("txlog").option("version", "1").load(path).count()
        == 2
    )
    with pytest.raises(Exception, match="time travel"):
        (
            spark.read.format("txlog")
            .option("version", "99")
            .load(path)
            .collect()
        )


# ------------------------------------------ LTZ skipping needs UTC --


_TS_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("ts", TimestampType()),
        StructField("tsntz", TimestampNTZType()),
    ]
).json()

_TS_STATS = {
    "f1": {
        "id": {"k": "num", "min": 0, "max": 9, "nulls": 0},
        "ts": {
            "k": "str",
            "min": "2024-01-01T00:00:00",
            "max": "2024-01-31T23:59:59",
            "nulls": 0,
        },
        "tsntz": {
            "k": "str",
            "min": "2024-01-01T00:00:00",
            "max": "2024-01-31T23:59:59",
            "nulls": 0,
        },
    },
}


def test_ltz_literal_skipping_gated_on_utc_session():
    """File stats for TIMESTAMP (LTZ) are naive UTC but Spark casts the
    predicate's string literal in the SESSION timezone: a skip is only
    sound when the session is UTC. Unknown or non-UTC sessions must keep
    the file; TIMESTAMP_NTZ is wall-clock on both sides and skips
    regardless."""
    pred = "ts > '2024-06-01'"
    # provably excludable under UTC
    assert (
        candidate_files(pred, _TS_SCHEMA, ["f1"], _TS_STATS, session_tz="UTC")
        == []
    )
    # unknown session: conservative, keep
    assert candidate_files(pred, _TS_SCHEMA, ["f1"], _TS_STATS) == ["f1"]
    # non-UTC session: a 2024-06-01 literal in New York is 2024-06-01
    # 04:00 UTC — different instant than the stats assume; keep
    assert (
        candidate_files(
            pred,
            _TS_SCHEMA,
            ["f1"],
            _TS_STATS,
            session_tz="America/New_York",
        )
        == ["f1"]
    )
    # NTZ is timezone-free: skips even under a non-UTC session
    assert (
        candidate_files(
            "tsntz > '2024-06-01'",
            _TS_SCHEMA,
            ["f1"],
            _TS_STATS,
            session_tz="America/New_York",
        )
        == []
    )
    # other column types are unaffected by the gate
    assert (
        candidate_files(
            "id > 50",
            _TS_SCHEMA,
            ["f1"],
            _TS_STATS,
            session_tz="America/New_York",
        )
        == []
    )
