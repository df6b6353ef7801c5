"""The complete reference scenario end-to-end: config-driven incremental
ingestion from a REAL JDBC database (embedded Derby) into the lake, with
watermark state tracked across runs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.config.repository import ConfigRepository
from bigdataingestion_spark.config.state import TableLoadDetails
from bigdataingestion_spark.pipeline.orchestrator import Orchestrator
from bigdataingestion_spark.sinks.writer import DatalakeWriter
from bigdataingestion_spark.sources.jdbc import JdbcSource


@pytest.fixture()
def derby_db(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/sourcedb;create=true"
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        'CREATE TABLE "visits" ("visit_id" INT, "createddate" TIMESTAMP, '
        '"patient" VARCHAR(30))'
    )
    for i in range(1, 21):
        day = (i % 9) + 1
        st.executeUpdate(
            f'INSERT INTO "visits" VALUES ({i}, '
            f"TIMESTAMP('2024-01-0{day} 08:00:00'), 'p{i}')"
        )
    conn.close()
    return url, conn


def _orchestrator(spark, tmp_path, url, limit):
    config = ConfigRepository(str(tmp_path / "meta" / "config.parquet"))
    config.insert("dcx_postgresql_db_settings", "petclinic_db_name", "sourcedb")
    config.insert("dcx_postgresql_table_settings", "petclinic_tables", "visits")
    return Orchestrator(
        spark=spark,
        source=JdbcSource(
            spark,
            host="unused",
            driver="org.apache.derby.jdbc.EmbeddedDriver",
            jdbc_url=url,
        ),
        writer=DatalakeWriter(str(tmp_path / "lake")),
        config=config,
        state=TableLoadDetails(str(tmp_path / "meta" / "state.parquet")),
        single_batch_limit=limit,
    )


def test_jdbc_pipeline_initial_and_incremental(spark, tmp_path, derby_db):
    url, _ = derby_db
    orch = _orchestrator(spark, tmp_path, url, limit=10)

    # run 1: 20 rows > limit 10, heuristic discovers "createddate" -> chunked
    results = {r.table: r for r in orch.run(run_date="2026-08-13")}
    assert results["visits"].strategy == "chunked"
    assert results["visits"].rows == 20
    lake = str(tmp_path / "lake" / "visits" / "2026" / "08" / "13")
    assert spark.read.parquet(lake).count() == 20

    # state: max(createddate) - 80h
    last = orch.state.get_last_load_date(
        "databricks_prod_new_workspace", "sharestory", "visits"
    )
    assert last == "2024-01-06 00:00:00"  # 2024-01-09 08:00 - 80h

    # insert new rows in the source, run 2 picks up only >= watermark
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        'INSERT INTO "visits" VALUES (100, TIMESTAMP(\'2024-02-01 09:00:00\'), \'new\')'
    )
    conn.close()
    results2 = {r.table: r for r in orch.run(run_date="2026-08-14")}
    # rows >= 2024-01-06: days 6..9 of the cycle (8 rows) + the new row
    expected = 9
    assert results2["visits"].rows == expected
    lake2 = str(tmp_path / "lake" / "visits" / "2026" / "08" / "14")
    got = spark.read.parquet(lake2)
    assert got.count() == expected
    assert got.filter(F.col("visit_id") == 100).count() == 1
