"""Table-name resolution and source-query generation.

Reproduces the reference's table-naming conventions and its source-side
watermark pushdown query, parameterized instead of inline f-strings where the
engine controls the values.

Naming rules (reference ``PostgresToDataLake_Ingestion_Notebook.py:175-200``,
``getFilePath``): a configured table entry is one of
  * ``schema.table``          -> quoted ``"schema"."table"``; lake dir ``{table}/``
  * ``task__schema.table``    -> schema after ``__``; lake dir ``{task}{table_lower}/``
    (the reference computes this dir then immediately overwrites it with the
    plain ``{table}/`` form — a bug we reproduce because the *observable* path
    is the overwritten one; see note below)
  * ``task__table``           -> bare quoted table; lake dir ``{task}{table_lower}/``
    except ``task == 'rxrefill'`` -> ``Rx{table}/`` (original case)
  * ``table``                 -> bare quoted table; lake dir ``{table}/``

Watermark pushdown (reference ``:272-283``, ``getQryFilteredOnWatermark``):
``SELECT * FROM t WHERE COALESCE("c1","c2",...) >= CAST('{ts}' AS TIMESTAMP)``
— evaluated inside the source database. Spark will NOT push a COALESCE
predicate through the JDBC source, so generating the SQL ourselves is the
correct scale design (one source-side index scan instead of a full fetch).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TableAddress:
    """Resolved identity of one configured source table."""

    raw: str  # config entry as written, e.g. 'analytics__public.events'
    task: str  # domain prefix from the table-config key, e.g. 'reliefvet'
    schema: str | None  # unquoted schema name, None if bare table
    table: str  # unquoted table name (original case)
    lake_dir: str  # relative directory name under the lake base path

    @property
    def quoted_table(self) -> str:
        return f'"{self.table}"'

    @property
    def qualified(self) -> str:
        """Source-side FROM target with Postgres-style quoting."""
        if self.schema is not None:
            return f'"{self.schema}"."{self.table}"'
        return f'"{self.table}"'

    @property
    def state_key(self) -> str:
        """Case-insensitive key used for watermark state lookup
        (reference matches ``lower(TableName)``, ING:389)."""
        return self.table.lower()


def resolve_table(tbl: str, task: str) -> TableAddress:
    """Parse one comma-list entry from the table config.

    Mirrors the decision tree of the reference's ``getFilePath`` (ING:175-200)
    including the quirk that for ``task__schema.table`` entries the
    task-prefixed directory is computed and then *overwritten* by the plain
    ``{table}/`` directory (ING:180 vs ING:184 — the second assignment wins).
    """
    if "." in tbl:
        head, _, tail = tbl.partition(".")
        if "__" in head:
            schema = head.split("__")[1]
        else:
            schema = head
        # ING:184 unconditionally overwrites file_path with the plain form.
        return TableAddress(raw=tbl, task=task, schema=schema, table=tail, lake_dir=tail)
    if "__" in tbl:
        table = tbl.split("__")[-1]
        if task == "rxrefill":
            lake_dir = f"Rx{table}"  # ING:192
        else:
            lake_dir = f"{task}{table.lower()}"  # ING:194
        return TableAddress(raw=tbl, task=task, schema=None, table=table, lake_dir=lake_dir)
    return TableAddress(raw=tbl, task=task, schema=None, table=tbl, lake_dir=tbl)


def select_all_query(addr: TableAddress) -> str:
    """Full-scan source query (reference ING:185, :189, :197)."""
    return f"SELECT * FROM {addr.qualified}"


def watermark_filtered_query(
    addr: TableAddress, watermark_cols: list[str], last_load_date: str
) -> str:
    """Incremental source query with the watermark predicate evaluated
    source-side (reference ING:272-283).

    ``last_load_date`` is rendered as a literal because the JDBC ``query``
    option cannot carry bind parameters; the value comes from our own state
    table (a timestamp we wrote), never from user input.
    """
    if not watermark_cols:
        return select_all_query(addr)
    ts = str(last_load_date).replace("'", "''")
    if len(watermark_cols) == 1:
        # 1-arg COALESCE is a Postgres leniency other engines reject
        # (Derby: 42000); the bare column is identical semantics
        expr = f'"{watermark_cols[0]}"'
    else:
        expr = "COALESCE(" + ",".join(f'"{c}"' for c in watermark_cols) + ")"
    return (
        f"SELECT * FROM {addr.qualified} "
        f"WHERE {expr} >= CAST('{ts}' AS TIMESTAMP)"
    )
