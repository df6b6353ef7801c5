"""Property-based chunk-planner invariants (SURVEY §5.3): for ANY volume
distribution, the plan is an exact partition of the day-level profile and
every written chunk is either day-level or within the limit — plus an
end-to-end skewed-year parity check (chunked write == partitioned write ==
source)."""

from __future__ import annotations

import os
from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataingestion_spark.plans.chunker import plan_chunks

day_entry = st.tuples(
    st.integers(min_value=2020, max_value=2026),  # year
    st.integers(min_value=1, max_value=12),  # month
    st.integers(min_value=1, max_value=28),  # day
    st.integers(min_value=1, max_value=5000),  # count
)


def _profile(entries):
    # collapse duplicate (y, m, d) and derive quarter
    agg = {}
    for y, m, d, c in entries:
        agg[(y, m, d)] = agg.get((y, m, d), 0) + c
    return [((y), ((m - 1) // 3 + 1), m, d, c) for (y, m, d), c in agg.items()]


def _covers(chunk, key):
    y, q, m, d = key
    return (
        chunk.year == y
        and (chunk.quarter is None or chunk.quarter == q)
        and (chunk.month is None or chunk.month == m)
        and (chunk.day is None or chunk.day == d)
    )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(day_entry, min_size=1, max_size=60),
    st.integers(min_value=1, max_value=20000),
)
def test_plan_is_exact_partition_and_respects_limit(entries, limit):
    profile = _profile(entries)
    chunks = plan_chunks(profile, limit)
    counts = {(y, q, m, d): c for y, q, m, d, c in profile}

    # 1. every day-cell covered by exactly one chunk
    for key in counts:
        assert sum(1 for c in chunks if _covers(c, key)) == 1

    # 2. every non-day chunk's total is within the limit
    for c in chunks:
        if c.level != "day":
            total = sum(v for k, v in counts.items() if _covers(c, k))
            assert total <= limit

    # 3. total rows conserved
    assert sum(
        sum(v for k, v in counts.items() if _covers(c, k)) for c in chunks
    ) == sum(counts.values())


def _skewed_rows():
    """One year >> limit (2024: a 150-row month forcing day descent, five
    60-row months), one year << limit (2022: 30 rows), and 7 NULL-watermark
    rows (the reference-crashing case the planner folds into a None-year
    chunk)."""
    rows, eid = [], 0
    for day in range(1, 6):  # 2024-01: 150 rows, 30/day -> day-level chunks
        for _ in range(30):
            rows.append((eid, datetime(2024, 1, day, 12, 0, 0)))
            eid += 1
    for month in range(2, 7):  # 2024-02..06: 60 rows each -> month level
        for i in range(60):
            rows.append((eid, datetime(2024, month, 1 + i % 3, 8, 0, 0)))
            eid += 1
    for i in range(30):  # 2022: 30 rows -> whole-year chunk
        rows.append((eid, datetime(2022, 1 + i % 12, 5, 1, 0, 0)))
        eid += 1
    for _ in range(7):  # NULL watermark
        rows.append((eid, None))
        eid += 1
    return rows


def _orchestrate(spark, tmp_path, rows, strategy, limit):
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType, StructField, StructType, TimestampType,
    )

    from bigdataingestion_spark.config.repository import ConfigRepository
    from bigdataingestion_spark.config.state import TableLoadDetails
    from bigdataingestion_spark.pipeline.orchestrator import Orchestrator
    from bigdataingestion_spark.sinks.audit import AuditLog, LogAlertSink
    from bigdataingestion_spark.sinks.writer import DatalakeWriter, SinkPolicy
    from bigdataingestion_spark.sources.files import FileSource

    root = tmp_path / strategy
    src_dir = root / "source" / "analytics"
    os.makedirs(src_dir)
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("createddate", TimestampType()),
        ]
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "modifieddate", F.lit(None).cast("timestamp")
    )
    df.write.parquet(str(src_dir / "events.parquet"))

    config = ConfigRepository(str(root / "meta" / "configvalues.parquet"))
    config.insert("dcx_postgresql_db_settings", "analytics_db_name", "analytics")
    config.insert("dcx_postgresql_table_settings", "analytics_tables", "events")
    audit = AuditLog(path=str(root / "audit" / "logs.jsonl"))
    orch = Orchestrator(
        spark=spark,
        source=FileSource(spark, str(root / "source")),
        writer=DatalakeWriter(str(root / "lake"), SinkPolicy()),
        config=config,
        state=TableLoadDetails(str(root / "meta" / "state.parquet")),
        audit=audit,
        alerts=LogAlertSink(audit=audit),
        single_batch_limit=limit,
    )
    orch.write_strategy = strategy
    results = {r.table: r for r in orch.run(run_date="2026-08-13")}
    lake = str(root / "lake" / "events" / "2026" / "08" / "13")
    written = spark.read.parquet(lake).drop("_ingest_year", "_ingest_month")
    return results["events"], written


def test_skewed_year_chunked_vs_partitioned_write_parity(spark, tmp_path):
    """The core reference semantic under skew: one year dwarfs the limit
    while others sit far below it. Both write strategies must emit exactly
    the source content — no row lost (the reference's ==limit hole), none
    duplicated — and the chunk plan must mix day/month/year levels."""
    rows = _skewed_rows()
    want_ids = sorted(r[0] for r in rows)

    chunked, written_c = _orchestrate(spark, tmp_path, rows, "chunked", 100)
    parted, written_p = _orchestrate(spark, tmp_path, rows, "partitioned", 100)

    assert chunked.strategy == "chunked" and parted.strategy == "chunked"
    # plan shape: 5 day chunks (2024-01) + 5 month chunks (2024-02..06)
    # + 1 year chunk (2022) + 1 NULL-year chunk
    assert chunked.chunks == 12

    got_c = sorted(r.event_id for r in written_c.select("event_id").collect())
    got_p = sorted(r.event_id for r in written_p.select("event_id").collect())
    assert got_c == want_ids
    assert got_p == want_ids
