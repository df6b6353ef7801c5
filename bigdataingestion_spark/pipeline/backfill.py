"""Backfill planner: find and fill missing dated lake partitions.

The reference pipeline loads "today" on a schedule; when a run is missed
(outage, upstream delay) the dated-path layout ``{base}/{table}/{y}/{m}/{d}``
(ING:460) silently gains holes. This planner diffs the days present in the
SOURCE against the days materialized in the LAKE and re-runs only the
missing ones — the targeted-replay operation an operator performs after an
incident, without rewriting healthy partitions.

Scale notes: the source side of the diff is a distinct-days aggregate
(bounded by calendar cardinality — decades fit in thousands of rows, safe
to collect, same argument as the chunk planner's pre-aggregated profile);
the lake side is a driver-side directory walk of the dated layout (one
entry per day, no data read). Each backfilled day writes through the same
``DatalakeWriter`` policy path as a scheduled run, so re-running a backfill
is idempotent (per-day overwrite)."""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from datetime import date

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.writer import DatalakeWriter

_DAY_DIR = re.compile(r"^\d{4}/\d{2}/\d{2}$")


def lake_days(base_path: str, lake_dir: str) -> set[date]:
    """Days already materialized under ``{base}/{lake_dir}/{y}/{m}/{d}``."""
    root = os.path.join(base_path, lake_dir)
    found: set[date] = set()
    if not os.path.isdir(root):
        return found
    for y in os.listdir(root):
        for m in os.listdir(os.path.join(root, y)) if os.path.isdir(os.path.join(root, y)) else []:
            md = os.path.join(root, y, m)
            for d in os.listdir(md) if os.path.isdir(md) else []:
                dd = os.path.join(md, d)
                # stray files (a _SUCCESS marker named like '01') and
                # non-calendar dirs (2024/02/30) must not abort the plan
                if not _DAY_DIR.match(f"{y}/{m}/{d}") or not os.path.isdir(dd):
                    continue
                try:
                    day = date(int(y), int(m), int(d))
                except ValueError:
                    continue
                if os.listdir(dd):
                    found.add(day)
    return found


def source_days(df: DataFrame, ts_col: str) -> list[date]:
    """Distinct event days in the source — a bounded aggregate (calendar
    cardinality), collected by design like the chunk planner's profile."""
    rows = (
        df.select(F.to_date(F.col(ts_col)).alias("d"))
        .where(F.col("d").isNotNull())
        .distinct()
        .collect()
    )
    return sorted(r["d"] for r in rows)


@dataclass
class BackfillPlanner:
    writer: DatalakeWriter
    task: str = "dcx"

    def plan(self, df: DataFrame, ts_col: str, lake_dir: str) -> list[date]:
        have = lake_days(self.writer.base_path, lake_dir)
        return [d for d in source_days(df, ts_col) if d not in have]

    def run(
        self, df: DataFrame, ts_col: str, lake_dir: str, limit: int | None = None
    ) -> list[str]:
        """Fill every missing day (oldest first); returns the paths written.

        One filtered write per missing day, each an idempotent overwrite of
        exactly that dated path — healthy partitions are never touched.
        ``limit`` caps a single invocation (operators drain large holes in
        bounded batches).
        """
        missing = self.plan(df, ts_col, lake_dir)
        if limit is not None:
            missing = missing[:limit]
        written: list[str] = []
        day_col = F.to_date(F.col(ts_col))
        for d in missing:
            path = self.writer.run_path(lake_dir, d.isoformat())
            self.writer.write(
                df.filter(day_col == F.lit(d)), self.task, path, "overwrite"
            )
            written.append(path)
        return written
