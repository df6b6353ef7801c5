"""Tracked DataFrame caches with explicit release.

Several operators cache a large intermediate (shingle tables, word arrays)
that is consumed more than once inside a single lazy plan. The operator
functions return lazy DataFrames, so they cannot unpersist before the caller
materializes the result — and an unreleased cache of the pipeline's largest
intermediate would otherwise live for the whole session, relying on executor
LRU eviction. Callers that run many queries in one session (bench.py, long
pytest sessions) call :func:`release_caches` between queries instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE_CACHES: list[DataFrame] = []


def cache_tracked(df: DataFrame) -> DataFrame:
    """``df.cache()`` plus registration for a later :func:`release_caches`."""
    df = df.cache()
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    """Unpersist every tracked cache (safe if already evicted or unused)."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()
