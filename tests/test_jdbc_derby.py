"""JdbcSource end-to-end against embedded Derby (the JDBC jars Spark ships
for its metastore). Exercises the REAL JDBC read path: query-option
pushdown, quoted identifiers, and the source-side COALESCE watermark filter
— the same code path a PostgreSQL deployment runs."""

from __future__ import annotations

import pytest

from bigdataingestion_spark.sources.jdbc import JdbcSource
from bigdataingestion_spark.sources.querygen import resolve_table


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    db_path = str(tmp_path_factory.mktemp("derby") / "testdb")
    url = f"jdbc:derby:{db_path};create=true"
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        'CREATE TABLE "events" ("event_id" INT, "createddate" TIMESTAMP, '
        '"modifieddate" TIMESTAMP, "payload" VARCHAR(50))'
    )
    rows = [
        (1, "2024-01-01 10:00:00", None, "a"),
        (2, "2024-01-05 10:00:00", None, "b"),
        (3, None, "2024-01-09 10:00:00", "c"),  # COALESCE falls to modified
        (4, "2024-01-12 10:00:00", None, "d"),
    ]
    for eid, cd, md, pl in rows:
        cd_sql = f"TIMESTAMP('{cd}')" if cd else "NULL"
        md_sql = f"TIMESTAMP('{md}')" if md else "NULL"
        st.executeUpdate(
            f'INSERT INTO "events" VALUES ({eid}, {cd_sql}, {md_sql}, \'{pl}\')'
        )
    conn.close()
    return url


@pytest.fixture()
def source(spark, derby):
    return JdbcSource(
        spark,
        host="unused",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        jdbc_url=derby,
    )


def test_jdbc_full_table_read(spark, source):
    addr = resolve_table("events", task="analytics")
    df = source.read_table("testdb", addr)
    assert df.count() == 4
    assert set(df.columns) == {"event_id", "createddate", "modifieddate", "payload"}


def test_jdbc_watermark_pushdown_with_coalesce(spark, source):
    """The COALESCE >= CAST(ts) predicate executes INSIDE the database —
    row 3 (NULL createddate) must be selected via its modifieddate."""
    addr = resolve_table("events", task="analytics")
    df = source.read_increment(
        "testdb", addr, ["createddate", "modifieddate"], "2024-01-08 00:00:00"
    )
    got = sorted(r.event_id for r in df.collect())
    assert got == [3, 4]


def test_jdbc_schema_qualified_read(spark, derby):
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(derby)
    st = conn.createStatement()
    st.executeUpdate('CREATE SCHEMA "staging"')
    st.executeUpdate('CREATE TABLE "staging"."Orders" ("id" INT)')
    st.executeUpdate('INSERT INTO "staging"."Orders" VALUES (7)')
    conn.close()
    src = JdbcSource(
        spark, host="unused",
        driver="org.apache.derby.jdbc.EmbeddedDriver", jdbc_url=derby,
    )
    addr = resolve_table("staging.Orders", task="analytics")
    df = src.read_table("testdb", addr)
    assert [r.id for r in df.collect()] == [7]
