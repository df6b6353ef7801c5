"""Incremental consumption of a txlog table (Delta streaming-source shape).

The reference's downstream consumers re-read whole Delta tables per run;
Delta's streaming source instead feeds consumers only the files each commit
added. ``sinks.txlog.read_changes`` provides that primitive; this module is
the driver loop around it — the ``Trigger.AvailableNow`` consumption
pattern: each invocation processes every version committed since the last
run, then persists its position.

Exactly-once requires the processed RANGE to be deterministic across a
crash-retry, which a naive "last position -> current version" range is
not: if the source advances between the crash and the retry, the retry
would cover a wider range under a different identity and double-deliver
the overlap. The loop therefore WRITE-AHEADS its intent (the planned
``(from, to]`` range) into the position file before processing — exactly
how Structured Streaming records offsets in the checkpoint before running
a batch. A retry finds the pending range and re-runs exactly it; newer
commits wait for the next tick. With a downstream that deduplicates on
the range identity — ``txlog_mirror`` appends under
``txn_id=f"{scope}:{from}-{to}"`` so the destination's log no-ops a replay
— delivery is exactly-once no matter where the consumer crashed. Losing
the position file itself is checkpoint loss (same contract as
``stream_txlog_ingest``: don't).

Scale: each tick moves only the delta (the files the source's commits
added). A 100 TB source table with a 10 GB/day append rate costs the
mirror 10 GB/day, not 100 TB/day — per-run cost proportional to change
rate, the property that makes downstream pipelines viable at scale.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdataingestion_spark.sinks.txlog import TxLogTable


def _read_state(state_path: str) -> dict:
    """ABSENT state file = fresh consumer (start from the beginning).
    A PRESENT-but-unreadable one is corruption, not a fresh start: silently
    resetting to -1 would re-deliver every prior range under NEW range
    identities ("-1-N" instead of the original splits), which a txn-id
    deduplicating sink cannot no-op — duplicates. Raise instead; the
    operator restores the file or deliberately deletes it to re-bootstrap
    an idempotent-by-content sink."""
    try:
        raw = open(state_path).read()
    except FileNotFoundError:
        return {"version": -1, "pending": None}
    try:
        d = json.loads(raw)
        return {"version": int(d["version"]), "pending": d.get("pending")}
    except (ValueError, TypeError, KeyError) as e:
        raise ValueError(
            f"corrupt tail position file {state_path!r} ({e}); restore it, "
            "or delete it ONLY if the downstream sink deduplicates by "
            "content — a deleted position replays all history under new "
            "range identities"
        ) from e


def _write_state(state_path: str, state: dict) -> None:
    os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
    tmp = f"{state_path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, state_path)  # atomic: a crash never tears the state


def txlog_tail(
    spark: SparkSession,
    table: TxLogTable,
    process: Callable[[DataFrame, int, int], None],
    state_path: str,
    allow_rewrites: bool = False,
) -> int:
    """One tick: plan (or resume) a version range, hand
    ``process(changes_df, from_version, to_version)`` the rows added in
    ``(from_version, to_version]``, then advance the position. A crashed
    tick leaves its planned range pending and the retry re-runs exactly
    that range (write-ahead intent — see module docstring). Returns the
    new position (unchanged if nothing new). At-least-once on its own —
    give ``process`` a sink idempotent on the (from, to) identity (or use
    ``txlog_mirror``) for exactly-once."""
    st = _read_state(state_path)
    if st["pending"]:
        from_v, to_v = st["pending"]
    else:
        cur = table.version()
        if cur <= st["version"]:
            return st["version"]
        from_v, to_v = st["version"], cur
        _write_state(state_path, {"version": from_v, "pending": [from_v, to_v]})
    changes = table.read_changes(
        spark, from_version=from_v, to_version=to_v, allow_rewrites=allow_rewrites
    )
    process(changes, from_v, to_v)
    _write_state(state_path, {"version": to_v, "pending": None})
    return to_v


def txlog_tail_available_now(
    spark: SparkSession,
    table: TxLogTable,
    process: Callable[[DataFrame, int, int], None],
    state_path: str,
    allow_rewrites: bool = False,
) -> int:
    """Drain ticks until the position catches the table's latest version
    (Trigger.AvailableNow): a pending crashed range is re-run first, then
    everything newer in one more tick."""
    pos = -2
    while True:
        new = txlog_tail(spark, table, process, state_path, allow_rewrites)
        if new == pos or new >= table.version():
            return new
        pos = new


def txlog_mirror(
    spark: SparkSession,
    source: TxLogTable,
    dest: TxLogTable,
    state_path: str,
    scope: str | None = None,
) -> int:
    """Incremental txlog -> txlog replication, exactly-once: each planned
    range appends to ``dest`` under a range-derived ``txn_id``; a crashed
    run's retry re-appends the SAME pending range (write-ahead intent) and
    the destination's log no-ops it. Append-only sources only
    (``read_changes`` refuses rewrite commits — a compacted source is
    fine, a merged/deleted one needs a fresh full copy instead).

    The default ``scope`` hashes the source's ABSOLUTE path (the same rule
    ``stream_txlog_ingest`` uses for checkpoint dirs): two different
    sources mirroring into one destination always get distinct txn scopes,
    where a basename-derived scope would collide on the common
    ``.../a/events`` vs ``.../b/events`` layout and silently drop the
    second mirror's ranges as replays. Pin an explicit ``scope`` if the
    source path is not stable across runs (mounts, relocations)."""
    from bigdataingestion_spark.streaming.ingest import path_txn_scope

    scope = scope or "mirror-" + path_txn_scope(source.path)

    def _apply(changes: DataFrame, from_v: int, to_v: int) -> None:
        dest.append(changes, txn_id=f"{scope}:{from_v}-{to_v}")

    return txlog_tail_available_now(spark, source, _apply, state_path)
