"""Config registrar — parity with ``insert_Postgres_Configs.py``.

The reference notebook registers a database + its table list + optional
watermark columns into ``configurations.configvalues`` via widgets
(CFG:33-48) and branch logic (CFG:130-146):

  * new database (no ``{db_config_name}`` row yet) -> insert db row AND
    table-list row
  * existing database -> SQL UPDATE of the CSV table list
  * watermark config inserted only if absent (never updated)
  * new table names that collide with an already-known source table get a
    ``{task}_`` prefix (``getUpdatedTablesList``, CFG:76-90)

Rebuilt as a plain function + argparse CLI (no widgets/dbutils).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from bigdataingestion_spark.config.repository import ConfigRepository, merge_tables_list
from bigdataingestion_spark.pipeline.orchestrator import (
    DB_SETTINGS_GROUP,
    TABLE_SETTINGS_GROUP,
    WATERMARK_SETTINGS_GROUP,
)


@dataclass
class RegistrarResult:
    inserted: list[str] = field(default_factory=list)
    updated: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)


def register_configs(
    repo: ConfigRepository,
    database_config_name: str,
    database_name: str,
    table_config_name: str,
    tables_name: str,
    watermark_config_name: str = "",
    watermarks_name: str = "",
) -> RegistrarResult:
    """Insert/update db, table-list, and watermark configs (CFG:130-146)."""
    res = RegistrarResult()

    # known source tables = every table in every registered list (CFG:66-71,
    # including inactive rows — the reference's probe has no is_active filter)
    tbls_details = repo.get_group(TABLE_SETTINGS_GROUP, active_only=False)
    known_tables = [t for csv in tbls_details.values() for t in csv.split(",")]

    existing_tables_csv = repo.get_value(TABLE_SETTINGS_GROUP, table_config_name)
    database_exists = repo.get_value(DB_SETTINGS_GROUP, database_config_name) is not None
    task = table_config_name.split("_")[0]

    merged_csv = merge_tables_list(
        existing_tables_csv, tables_name, task, known_tables
    )

    if not database_exists and database_config_name and database_name:
        if repo.insert(DB_SETTINGS_GROUP, database_config_name, database_name):
            res.inserted.append(database_config_name)
        else:
            res.skipped.append(database_config_name)
        if repo.insert(TABLE_SETTINGS_GROUP, table_config_name, merged_csv):
            res.inserted.append(table_config_name)
        else:
            res.skipped.append(table_config_name)
    elif table_config_name and merged_csv:
        repo.update_value(TABLE_SETTINGS_GROUP, table_config_name, merged_csv)
        res.updated.append(table_config_name)

    if watermark_config_name and watermarks_name:
        wm_csv = ",".join(c.strip() for c in watermarks_name.split(","))
        if repo.get_value(WATERMARK_SETTINGS_GROUP, watermark_config_name) is None:
            if repo.insert(WATERMARK_SETTINGS_GROUP, watermark_config_name, wm_csv):
                res.inserted.append(watermark_config_name)
        else:
            res.skipped.append(watermark_config_name)
    return res


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Register ingestion configs")
    p.add_argument("--config-store", required=True, help="configvalues parquet path")
    p.add_argument("--database-config-name", required=True)
    p.add_argument("--database-name", required=True)
    p.add_argument("--table-config-name", required=True)
    p.add_argument("--tables-name", required=True, help="comma-separated tables")
    p.add_argument("--watermark-config-name", default="")
    p.add_argument("--watermarks-name", default="")
    a = p.parse_args(argv)
    res = register_configs(
        ConfigRepository(a.config_store),
        a.database_config_name,
        a.database_name,
        a.table_config_name,
        a.tables_name,
        a.watermark_config_name,
        a.watermarks_name,
    )
    print(f"inserted={res.inserted} updated={res.updated} skipped={res.skipped}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
