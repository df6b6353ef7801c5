"""Tracked DataFrame caches with explicit release.

Several operators cache a large intermediate (shingle tables, word arrays)
that is consumed more than once inside a single lazy plan. The operator
functions return lazy DataFrames, so they cannot unpersist before the caller
materializes the result — and an unreleased cache of the pipeline's largest
intermediate would otherwise live for the whole session, relying on executor
LRU eviction. Callers that run many queries in one session (bench.py, long
pytest sessions) call :func:`release_caches` between queries instead.

The registry holds the last :data:`_MAX_TRACKED` caches FIFO-bounded: a
library user who never calls :func:`release_caches` accumulates at most that
many Python/JVM references (older entries are evicted from the registry —
NOT unpersisted, their executor blocks still age out via Spark's own LRU —
so the registry itself can't grow without bound in long-lived services).
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame

_MAX_TRACKED = 64
_LIVE_CACHES: deque[DataFrame] = deque(maxlen=_MAX_TRACKED)


def cache_tracked(df: DataFrame) -> DataFrame:
    """``df.cache()`` plus registration for a later :func:`release_caches`."""
    df = df.cache()
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    """Unpersist every tracked cache (safe if already evicted or unused)."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()
