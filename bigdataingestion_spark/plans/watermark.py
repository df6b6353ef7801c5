"""Watermark-column resolution.

Reference semantics (``PostgresToDataLake_Ingestion_Notebook.py:149-170``,
``getCoalesceString``): an explicit config override
(``{task}_{table}_watermarks`` in group ``dcx_postgresql_watermark_settings``)
wins; otherwise columns are auto-discovered from the staged DataFrame's dtypes
by an exact (type, name-prefix) heuristic:

  * ``timestamp`` columns whose lowercased name starts with one of
    ``created  modified  updated  lastmodified  log  registration``
  * ``date`` columns whose lowercased name starts with ``merge  unmerge``

The heuristic determines which rows an incremental run picks up, so the
prefix lists are reproduced exactly. Note ``lastmodified*`` is subsumed by
``modified*``? No — 'lastmodified' does not start with 'modified'; both
prefixes are required, in the reference's order (order affects the COALESCE
argument order, which affects the effective watermark value when several
columns are non-null).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TIMESTAMP_PREFIXES = ("created", "modified", "updated", "lastmodified", "log", "registration")
DATE_PREFIXES = ("merge", "unmerge")


def heuristic_watermark_columns(dtypes: list[tuple[str, str]]) -> list[str]:
    """Discover watermark columns from ``df.dtypes`` pairs.

    Columns are returned in schema order, matching the reference's iteration
    over ``stageDf.dtypes`` (ING:162-168).
    """
    cols: list[str] = []
    for name, dtype in dtypes:
        low = name.lower()
        # Spark 4 reads parquet timestamps with isAdjustedToUTC=false as
        # TIMESTAMP_NTZ; the reference ran on Spark 3 where every timestamp
        # was LTZ, so both dtypes are "a timestamp column" for this heuristic.
        if dtype in ("timestamp", "timestamp_ntz") and low.startswith(
            TIMESTAMP_PREFIXES
        ):
            cols.append(name)
        elif dtype == "date" and low.startswith(DATE_PREFIXES):
            cols.append(name)
    return cols


def resolve_watermark_columns(
    df: DataFrame, override: str | list[str] | None = None
) -> list[str]:
    """Config override (CSV string or list) if present, else dtype heuristic."""
    if override:
        if isinstance(override, str):
            return [c for c in override.split(",") if c]
        return list(override)
    return heuristic_watermark_columns(df.dtypes)


def watermark_expr(watermark_cols: list[str]) -> Column:
    """``COALESCE(c1, c2, ...)`` — the reference's load-bearing expression
    (ING:209-211, :233-239, :280, :353). Single column -> no-op coalesce."""
    if not watermark_cols:
        raise ValueError("no watermark columns")
    return F.coalesce(*[F.col(c) for c in watermark_cols])
