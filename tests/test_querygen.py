"""Naming-convention and query-generation parity tests.

Expected values derived from the reference's getFilePath/getQryFilteredOnWatermark
decision tree (PostgresToDataLake_Ingestion_Notebook.py:175-200, :272-283).
"""

from bigdataingestion_spark.sources.querygen import (
    resolve_table,
    select_all_query,
    watermark_filtered_query,
)


def test_schema_qualified_table():
    a = resolve_table("public.events", task="analytics")
    assert a.schema == "public"
    assert a.table == "events"
    assert a.qualified == '"public"."events"'
    assert a.lake_dir == "events"
    assert select_all_query(a) == 'SELECT * FROM "public"."events"'


def test_task_prefixed_schema_table_uses_plain_dir():
    # ING:180 computes the task-prefixed dir then ING:184 overwrites it.
    a = resolve_table("analytics__staging.Orders", task="analytics")
    assert a.schema == "staging"
    assert a.table == "Orders"
    assert a.lake_dir == "Orders"
    assert a.qualified == '"staging"."Orders"'


def test_task_dunder_table():
    a = resolve_table("scribe__AuditLog", task="scribe")
    assert a.schema is None
    assert a.table == "AuditLog"
    assert a.lake_dir == "scribeauditlog"
    assert select_all_query(a) == 'SELECT * FROM "AuditLog"'


def test_rxrefill_special_case():
    a = resolve_table("rxrefill__Prescription", task="rxrefill")
    assert a.lake_dir == "RxPrescription"  # ING:192, original case


def test_bare_table():
    a = resolve_table("Hospital", task="reliefvet")
    assert a.table == "Hospital"
    assert a.lake_dir == "Hospital"
    assert a.qualified == '"Hospital"'
    assert a.state_key == "hospital"


def test_watermark_query_coalesce_pushdown():
    a = resolve_table("public.events", task="analytics")
    q = watermark_filtered_query(a, ["CreatedDate", "ModifiedDate"], "2024-01-05 00:00:00")
    assert q == (
        'SELECT * FROM "public"."events" WHERE '
        "COALESCE(\"CreatedDate\",\"ModifiedDate\") >= "
        "CAST('2024-01-05 00:00:00' AS TIMESTAMP)"
    )


def test_watermark_query_single_column_no_coalesce():
    # 1-arg COALESCE is Postgres-only leniency; bare column is portable
    a = resolve_table("events", task="analytics")
    q = watermark_filtered_query(a, ["CreatedDate"], "2024-01-05 00:00:00")
    assert q == (
        'SELECT * FROM "events" WHERE "CreatedDate" >= '
        "CAST('2024-01-05 00:00:00' AS TIMESTAMP)"
    )


def test_watermark_query_without_columns_is_full_scan():
    a = resolve_table("Hospital", task="reliefvet")
    assert watermark_filtered_query(a, [], "2024-01-01") == 'SELECT * FROM "Hospital"'
