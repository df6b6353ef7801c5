"""End-to-end ingestion pipeline tests on the driver's `events` fixture.

Scenario map (FIXTURES.md §C): incremental watermark load, chunk-tree descent,
no-watermark bulk path, format policy — all against a parquet FileSource
standing in for Postgres (the source protocol makes JDBC vs files a config
choice; orchestration logic is identical).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.config.repository import ConfigRepository
from bigdataingestion_spark.config.state import TableLoadDetails
from bigdataingestion_spark.pipeline.orchestrator import Orchestrator
from bigdataingestion_spark.sinks.audit import AuditLog, LogAlertSink
from bigdataingestion_spark.sinks.writer import DatalakeWriter, SinkPolicy
from bigdataingestion_spark.sources.files import FileSource

RUN_DATE = "2026-08-13"


@pytest.fixture()
def pipeline(spark, tmp_path, sf_smoke_dir):
    """A FileSource 'database' with an events table carrying heuristic
    watermark columns (createddate dense, modifieddate sparse with NULLs in
    createddate to exercise COALESCE)."""
    src_dir = tmp_path / "source" / "analytics"
    os.makedirs(src_dir)
    from bigdataingestion_spark.functions.io import load_table

    ev = load_table(spark, sf_smoke_dir, "events")
    ev = (
        ev.withColumn(
            "createddate",
            F.when(F.col("event_id") % 10 != 0, F.col("ts")).cast("timestamp"),
        )
        .withColumn(
            "modifieddate",
            F.when(F.col("event_id") % 10 == 0, F.col("ts")).cast("timestamp"),
        )
    )
    ev.write.parquet(str(src_dir / "events.parquet"))

    # a no-watermark table (part: no timestamp/date heuristic columns)
    part = spark.read.parquet(os.path.join(sf_smoke_dir, "part.parquet"))
    part.write.parquet(str(src_dir / "part.parquet"))

    config = ConfigRepository(str(tmp_path / "meta" / "configvalues.parquet"))
    config.insert("dcx_postgresql_db_settings", "analytics_db_name", "analytics")
    config.insert("dcx_postgresql_table_settings", "analytics_tables", "events,part")

    state = TableLoadDetails(str(tmp_path / "meta" / "state.parquet"))
    audit = AuditLog(path=str(tmp_path / "audit" / "logs.jsonl"))
    orch = Orchestrator(
        spark=spark,
        source=FileSource(spark, str(tmp_path / "source")),
        writer=DatalakeWriter(str(tmp_path / "lake"), SinkPolicy()),
        config=config,
        state=state,
        audit=audit,
        alerts=LogAlertSink(audit=audit),
        single_batch_limit=300,  # events sf0.001 has 1000 rows -> forces chunking
    )
    return orch, ev, tmp_path


def test_chunked_first_load_writes_all_rows(spark, pipeline):
    orch, ev, tmp_path = pipeline
    results = {r.table: r for r in orch.run(run_date=RUN_DATE)}

    assert results["events"].strategy == "chunked"
    assert results["events"].rows == 1000
    assert results["events"].chunks > 0

    # written content == source content (chunk union is an exact partition)
    written = spark.read.parquet(str(tmp_path / "lake" / "events" / "2026" / "08" / "13"))
    assert written.count() == 1000
    assert set(written.columns) == set(ev.columns)
    src_sum = ev.agg(F.sum("event_id")).first()[0]
    assert written.agg(F.sum("event_id")).first()[0] == src_sum

    # part: 200 rows < limit... sf0.001 part is small; whichever gate it hit,
    # content must match
    part_written = spark.read.parquet(str(tmp_path / "lake" / "part" / "2026" / "08" / "13"))
    assert part_written.count() == results["part"].rows


def test_watermark_state_written_with_80h_lag(spark, pipeline):
    orch, ev, _ = pipeline
    orch.run(run_date=RUN_DATE)
    last = orch.state.get_last_load_date(
        "databricks_prod_new_workspace", "sharestory", "events"
    )
    assert last is not None
    expected = ev.agg(
        (
            F.max(F.coalesce("createddate", "modifieddate"))
            - F.expr("INTERVAL 80 HOURS")
        ).alias("d")
    ).first()["d"]
    assert str(expected) == str(last)


def test_second_run_loads_only_overlap_window(spark, pipeline):
    orch, ev, tmp_path = pipeline
    orch.run(run_date=RUN_DATE)
    last = orch.state.get_last_load_date(
        "databricks_prod_new_workspace", "sharestory", "events"
    )
    results2 = {r.table: r for r in orch.run(run_date="2026-08-14")}
    expected = ev.filter(
        F.coalesce("createddate", "modifieddate")
        >= F.lit(last).cast("timestamp")
    ).count()
    assert results2["events"].rows == expected
    assert 0 < expected < 1000  # the 80h overlap, not a full reload


def test_no_watermark_big_table_bulk_path_and_alert(spark, pipeline):
    orch, _, tmp_path = pipeline
    orch.single_batch_limit = 50  # part (200 rows) now exceeds the limit
    results = {r.table: r for r in orch.run(run_date=RUN_DATE)}
    assert results["part"].strategy == "bulk-no-watermark"
    assert any(s[0] == "missing-watermark" for s in orch.alerts.sent)
    # no state row for a table without watermark columns
    assert (
        orch.state.get_last_load_date("databricks_prod_new_workspace", "sharestory", "part")
        is None
    )


def test_partitioned_write_strategy_same_content(spark, pipeline):
    orch, ev, tmp_path = pipeline
    orch.write_strategy = "partitioned"
    results = {r.table: r for r in orch.run(run_date=RUN_DATE)}
    assert results["events"].strategy == "chunked"
    written = spark.read.parquet(str(tmp_path / "lake" / "events" / "2026" / "08" / "13"))
    assert written.count() == 1000
    assert written.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]


def test_small_table_overwrite_is_idempotent(spark, pipeline):
    orch, _, tmp_path = pipeline
    orch.single_batch_limit = 10_000  # everything takes the small path now
    orch.run(run_date=RUN_DATE)
    orch.run(run_date=RUN_DATE)  # overwrite -> no duplication
    written = spark.read.parquet(str(tmp_path / "lake" / "events" / "2026" / "08" / "13"))
    assert written.count() == 1000


def test_sink_format_seam_passes_orc_through(spark, tmp_path):
    """The format policy is an open seam, not a parquet/delta enum: a
    policy electing ORC (Spark-native columnar alternative) round-trips
    through write and read_back with no writer changes."""
    from dataclasses import dataclass

    from bigdataingestion_spark.sinks.writer import DatalakeWriter, SinkPolicy

    @dataclass
    class OrcPolicy(SinkPolicy):
        def format_for(self, task: str) -> str:
            return "orc"

    writer = DatalakeWriter(str(tmp_path / "lake"), OrcPolicy())
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    fmt = writer.write(df, "dcx", str(tmp_path / "lake" / "t"), "overwrite", 2)
    assert fmt == "orc"
    back = writer.read_back(spark, "dcx", str(tmp_path / "lake" / "t"))
    assert sorted((r.id, r.v) for r in back.collect()) == [(1, "a"), (2, "b")]
    import os

    files = os.listdir(str(tmp_path / "lake" / "t"))
    assert any(f.endswith(".orc") for f in files), files
