"""Adaptive date-hierarchy chunk planner.

Reference semantics (``PostgresToDataLake_Ingestion_Notebook.py:205-247,
310-340``): big loads are split along the watermark's calendar hierarchy —
if a *year's* row count exceeds the limit, descend to its quarters; if a
quarter exceeds it, descend to its months; if a month exceeds it, write each
*day* individually; otherwise write the coarser chunk. Day is the finest
level and is always written per-day.

The reference computes this with O(levels x chunks) full scans of an uncached
temp view (every ``getListOfYearQuarterMonth``/``getDataCount*`` call at
ING:321-336 is a separate ``spark.sql(...).collect()`` over the whole staged
table — the dominant inefficiency at scale). The rebuild computes the whole
profile in ONE aggregation pass::

    df.groupBy(year(wm), quarter(wm), month(wm), day(wm)).count()

(a few thousand rows at most — bounded by distinct days), then folds the
chunk tree driver-side. At 100 TB this is a single map-side-combined shuffle
instead of dozens of full scans.

Semantic deviation (documented, SURVEY.md §4): the reference tests
``count > limit`` for "descend" and ``count < limit`` for "write" at the
quarter and month levels, so a chunk whose count is EXACTLY the limit matches
neither branch and is silently never written (data loss). We close the hole
with the year-level rule applied uniformly: descend iff ``count > limit``,
else write. Every row is written exactly once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdataingestion_spark.plans.watermark import watermark_expr


@dataclass(frozen=True, order=True)
class Chunk:
    """One write unit. ``None`` fields mean 'whole parent' — e.g.
    Chunk(2024, None, None, None) is all of year 2024."""

    year: int
    quarter: int | None = None
    month: int | None = None
    day: int | None = None

    @property
    def level(self) -> str:
        if self.day is not None:
            return "day"
        if self.month is not None:
            return "month"
        if self.quarter is not None:
            return "quarter"
        return "year"


def profile_chunks(df: DataFrame, watermark_cols: list[str]) -> list[tuple]:
    """Single-pass (year, quarter, month, day, count) profile of the staged
    data along its watermark. Replaces the reference's repeated full scans."""
    wm = watermark_expr(watermark_cols)
    rows = (
        df.groupBy(
            F.year(wm).alias("y"),
            F.quarter(wm).alias("q"),
            F.month(wm).alias("m"),
            F.dayofmonth(wm).alias("d"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    return [(r.y, r.q, r.m, r.d, r.cnt) for r in rows]


def plan_chunks(profile: list[tuple], limit: int) -> list[Chunk]:
    """Fold the day-level profile into the reference's chunk tree.

    Input tuples: (year, quarter, month, day, count). Rows with a NULL year
    (watermark entirely NULL for that row-group) are grouped into a single
    year-level chunk keyed by ``None``-year — the reference would crash on
    these (``year=None`` fails its truthiness kwargs), so emitting them as
    one chunk is a strict superset of its behavior and loses nothing.
    """
    years: dict[int | None, int] = {}
    quarters: dict[tuple, int] = {}
    months: dict[tuple, int] = {}
    days: dict[tuple, int] = {}
    for y, q, m, d, cnt in profile:
        years[y] = years.get(y, 0) + cnt
        quarters[(y, q)] = quarters.get((y, q), 0) + cnt
        months[(y, q, m)] = months.get((y, q, m), 0) + cnt
        days[(y, q, m, d)] = days.get((y, q, m, d), 0) + cnt

    chunks: list[Chunk] = []
    for y in sorted(years, key=lambda v: (v is None, v)):
        if y is None:
            chunks.append(Chunk(year=None))  # type: ignore[arg-type]
            continue
        if years[y] <= limit:
            chunks.append(Chunk(year=y))
            continue
        for (yy, q) in sorted(k for k in quarters if k[0] == y):
            if quarters[(yy, q)] <= limit:
                chunks.append(Chunk(year=y, quarter=q))
                continue
            for (_, _, m) in sorted(k for k in months if k[0] == y and k[1] == q):
                if months[(y, q, m)] <= limit:
                    chunks.append(Chunk(year=y, quarter=q, month=m))
                    continue
                for (_, _, _, d) in sorted(
                    k for k in days if k[0] == y and k[1] == q and k[2] == m
                ):
                    chunks.append(Chunk(year=y, quarter=q, month=m, day=d))
    return chunks


def chunk_predicate(chunk: Chunk, watermark_cols: list[str]) -> Column:
    """Filter expression selecting exactly one chunk's rows
    (reference ``getFilteredSourceData``, ING:252-267)."""
    wm = watermark_expr(watermark_cols)
    if chunk.year is None:
        return F.year(wm).isNull()
    pred = F.year(wm) == F.lit(chunk.year)
    if chunk.quarter is not None:
        pred = pred & (F.quarter(wm) == F.lit(chunk.quarter))
    if chunk.month is not None:
        pred = pred & (F.month(wm) == F.lit(chunk.month))
    if chunk.day is not None:
        pred = pred & (F.dayofmonth(wm) == F.lit(chunk.day))
    return pred
