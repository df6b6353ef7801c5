"""Incremental txlog consumption (streaming/tail.py): availableNow-style
tail over read_changes with write-ahead range intent, and exactly-once
txlog->txlog mirroring via range-derived txn ids (the Delta
streaming-source consumption shape)."""

from __future__ import annotations

import pytest

from bigdataingestion_spark.sinks.txlog import TxLogTable
from bigdataingestion_spark.streaming.tail import (
    _read_state,
    txlog_mirror,
    txlog_tail,
    txlog_tail_available_now,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tail_processes_only_the_delta(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "src"))
    state = str(tmp_path / "pos.json")
    seen: list[tuple[int, int, list]] = []

    def proc(df, from_v, to_v):
        seen.append((from_v, to_v, _rows(df)))

    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    assert txlog_tail(spark, t, proc, state) == 0
    t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))
    t.append(spark.createDataFrame([(3, "c")], ["id", "v"]))
    assert txlog_tail(spark, t, proc, state) == 2
    # nothing new: no processing, position unchanged
    assert txlog_tail(spark, t, proc, state) == 2

    assert seen == [
        (-1, 0, [(1, "a")]),
        (0, 2, [(2, "b"), (3, "c")]),
    ]


def test_crashed_tick_replays_exactly_its_planned_range(spark, tmp_path):
    """Write-ahead intent: a tick that crashes mid-processing leaves its
    planned range pending; the retry re-runs exactly that range even if
    the source advanced in between — newer commits wait for the next
    tick. This is what makes a range-keyed idempotent sink exactly-once."""
    t = TxLogTable(str(tmp_path / "src"))
    state = str(tmp_path / "pos.json")
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))

    def boom(df, from_v, to_v):
        raise RuntimeError("crash between sink and position write")

    with pytest.raises(RuntimeError):
        txlog_tail(spark, t, boom, state)
    assert _read_state(state) == {"version": -1, "pending": [-1, 0]}

    # the source advances while the consumer is down
    t.append(spark.createDataFrame([(2, "b")], ["id", "v"]))

    seen = []
    txlog_tail(spark, t, lambda df, a, b: seen.append((a, b, _rows(df))), state)
    txlog_tail(spark, t, lambda df, a, b: seen.append((a, b, _rows(df))), state)
    assert seen == [
        (-1, 0, [(1, "a")]),  # the pending range, exactly as planned
        (0, 1, [(2, "b")]),   # the advance, in its own tick
    ]
    assert _read_state(state) == {"version": 1, "pending": None}


def test_mirror_is_exactly_once_across_crashes(spark, tmp_path):
    src = TxLogTable(str(tmp_path / "src"))
    dst = TxLogTable(str(tmp_path / "dst"))
    state = str(tmp_path / "pos.json")

    src.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]))
    txlog_mirror(spark, src, dst, state)
    src.append(spark.createDataFrame([(3, "c")], ["id", "v"]))
    src.compact(spark)  # layout-only: transparent to the mirror
    txlog_mirror(spark, src, dst, state)
    assert _rows(dst.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]

    # crash simulation: the append landed but the position never advanced
    # (pending range reinstated), AND the source advanced meanwhile — the
    # worst case for naive range ids
    st = _read_state(state)
    from bigdataingestion_spark.streaming.tail import _write_state

    _write_state(state, {"version": 0, "pending": [0, st["version"]]})
    src.append(spark.createDataFrame([(4, "d")], ["id", "v"]))
    txlog_mirror(spark, src, dst, state)
    assert _rows(dst.read(spark)) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    assert _read_state(state)["pending"] is None


def test_tail_refuses_rewrites_without_opt_in(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "src"))
    state = str(tmp_path / "pos.json")
    # one physical file so the delete must rewrite it, carrying (2,'b')
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"]).coalesce(1))
    txlog_tail(spark, t, lambda df, a, b: None, state)
    t.delete(spark, "id = 1")
    with pytest.raises(ValueError):
        txlog_tail(spark, t, lambda df, a, b: None, state)
    # opt-in delivers the rewritten files' rows (at-least-once downstream)
    got = []
    txlog_tail(
        spark, t, lambda df, a, b: got.append(_rows(df)), state,
        allow_rewrites=True,
    )
    assert got == [[(2, "b")]]


def test_two_same_basename_sources_mirror_without_txn_collision(spark, tmp_path):
    """Default mirror scope hashes the source's absolute path: two sources
    that share a basename (.../a/events, .../b/events) feeding ONE
    destination must not collide on txn ids — a basename-derived scope
    would make the second mirror's ranges look like replays and silently
    drop them."""
    src_a = TxLogTable(str(tmp_path / "a" / "events"))
    src_b = TxLogTable(str(tmp_path / "b" / "events"))
    dst = TxLogTable(str(tmp_path / "dst"))
    src_a.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    src_b.append(spark.createDataFrame([(2, "b")], ["id", "v"]))

    txlog_mirror(spark, src_a, dst, str(tmp_path / "pos_a.json"))
    txlog_mirror(spark, src_b, dst, str(tmp_path / "pos_b.json"))
    assert _rows(dst.read(spark)) == [(1, "a"), (2, "b")]


def test_corrupt_position_file_raises_instead_of_replaying_history(tmp_path):
    """A present-but-unreadable position file is corruption; silently
    resetting to -1 would replay all history under NEW range identities
    that a txn-id sink cannot deduplicate."""
    state = tmp_path / "pos.json"
    state.write_text("{not json")
    with pytest.raises(ValueError, match="corrupt tail position"):
        _read_state(str(state))
    state.write_text('{"pending": null}')  # parseable but missing version
    with pytest.raises(ValueError, match="corrupt tail position"):
        _read_state(str(state))


def test_available_now_drains_in_one_call(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "src"))
    state = str(tmp_path / "pos.json")
    for i in range(4):
        t.append(spark.createDataFrame([(i,)], ["id"]))
    seen = []
    pos = txlog_tail_available_now(
        spark, t, lambda df, a, b: seen.append(_rows(df)), state
    )
    assert pos == 3
    assert sorted(r for batch in seen for r in batch) == [(0,), (1,), (2,), (3,)]
