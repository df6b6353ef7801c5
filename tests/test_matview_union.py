"""Union views (sinks/matview.py IncrementalUnionAggView): aggregates
over a fact SHARDED across several txlog tables, maintained from each
shard's CDF under a version-vector cursor.

The contract: after any DML sequence on any subset of shards,
``refresh()`` leaves the view EQUAL to a from-scratch aggregation of
the union of the current shard snapshots — additive across shards for
count/sum/avg, insert-only fold only when EVERY moved shard's window is
insert-only, affected-group recompute reading ALL shards otherwise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.matview import (
    IncrementalUnionAggView,
    MatviewDefinitionError,
    MatviewWindowUnreadableError,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable

SCHEMA = "id long, grp string, val double"


def _shards(spark, tmp_path, n=2):
    out = []
    for i in range(n):
        t = TxLogTable(str(tmp_path / f"s{i}"))
        t.append(
            spark.createDataFrame(
                [
                    (j, f"g{j % 3}", float(j))
                    for j in range(1, 31)
                    if j % n == i
                ],
                SCHEMA,
            )
        )
        t.alter_properties({"cdf.enabled": "true"})
        out.append(t)
    return out


def _view(tmp_path, shards, aggs=None, **kw):
    return IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        aggs
        or {
            "n": ("count", "1"),
            "s": ("sum", "val"),
        },
        **kw,
    )


def _rows(df, cols):
    return {
        r["grp"]: tuple(
            round(r[c], 6) if isinstance(r[c], float) else r[c]
            for c in cols
        )
        for r in df.collect()
    }


def _oracle(spark, shards, aggs):
    u = None
    for t in shards:
        fr = t.read(spark)
        u = fr if u is None else u.unionByName(fr)
    agged = u.groupBy("grp").agg(
        *[e.alias(n) for n, e in aggs.items()]
    )
    return _rows(agged, list(aggs))


def _add_aggs():
    return {"n": F.count(F.lit(1)), "s": F.sum("val")}


def test_build_and_additive_refresh_across_shards(spark, tmp_path):
    """Both shards move in one window (append to s0, update in s1,
    delete spanning both): one additive merge, view equals the
    from-scratch union aggregate; groups span shards throughout."""
    shards = _shards(spark, tmp_path)
    mv = _view(tmp_path, shards, rebuild_ratio=None)
    mv.build(spark)
    assert _rows(mv.read(spark), ["n", "s"]) == _oracle(
        spark, shards, _add_aggs()
    )
    shards[0].append(
        spark.createDataFrame([(100, "g0", 5.0), (101, "g3", 2.0)], SCHEMA)
    )
    shards[1].update(spark, "id % 5 = 0", {"val": "val * 2"})
    shards[0].delete(spark, "grp = 'g2'")
    shards[1].delete(spark, "grp = 'g2'")
    mv.refresh(spark)
    got = _rows(mv.read(spark), ["n", "s"])
    assert got == _oracle(spark, shards, _add_aggs())
    assert "g2" not in got and "g3" in got
    ops = [h["op"] for h in mv.view.history()]
    assert ops.count("merge") == 1  # one merge folds both shards


def test_single_shard_window_folds_alone(spark, tmp_path):
    shards = _shards(spark, tmp_path)
    mv = _view(tmp_path, shards, rebuild_ratio=None)
    mv.build(spark)
    shards[1].append(spark.createDataFrame([(200, "g1", 7.0)], SCHEMA))
    vec = mv.refresh(spark)
    assert vec == [t.version() for t in shards]
    assert _rows(mv.read(spark), ["n", "s"]) == _oracle(
        spark, shards, _add_aggs()
    )
    # nothing moved -> no-op
    assert mv.refresh(spark) == vec
    assert [h["op"] for h in mv.view.history()].count("merge") == 1


def test_minmax_insert_only_fold_requires_all_shards_appending(
    spark, tmp_path
):
    """min/max fold only when EVERY moved shard's window is insert-only:
    an append on s0 + a delete on s1 in one window must recompute."""
    shards = _shards(spark, tmp_path)
    aggs = {"mx": ("max", "val"), "mn": ("min", "val")}
    mv = _view(tmp_path, shards, aggs=aggs, rebuild_ratio=None)
    mv.build(spark)
    # pure-append window on both shards: fold, no source read
    shards[0].append(spark.createDataFrame([(300, "g0", 99.0)], SCHEMA))
    shards[1].append(spark.createDataFrame([(301, "g1", -9.0)], SCHEMA))
    mv.refresh(spark)
    assert mv.last_recompute_files is None
    want = _oracle(
        spark, shards, {"mx": F.max("val"), "mn": F.min("val")}
    )
    assert _rows(mv.read(spark), ["mx", "mn"]) == want
    # mixed window: append on s0, extreme-delete on s1 -> recompute
    shards[0].append(spark.createDataFrame([(302, "g0", 1.0)], SCHEMA))
    shards[1].delete(spark, "id = 301")
    mv.refresh(spark)
    assert mv.last_recompute_files is not None
    want = _oracle(
        spark, shards, {"mx": F.max("val"), "mn": F.min("val")}
    )
    assert _rows(mv.read(spark), ["mx", "mn"]) == want


def test_recompute_reads_every_shard_for_spanning_groups(spark, tmp_path):
    """Deleting g0's maximum from ONE shard must re-derive g0 from BOTH
    shards — the surviving extreme may live in the unmoved shard."""
    shards = _shards(spark, tmp_path)
    mv = _view(
        tmp_path, shards, aggs={"mx": ("max", "val")}, rebuild_ratio=None
    )
    mv.build(spark)
    # g0's rows: ids 3,6,...30 split across shards; delete the global max
    top = max(
        (r["id"] for t in shards for r in t.read(spark).filter("grp='g0'").collect())
    )
    owner = shards[top % 2]
    owner.delete(spark, f"id = {top}")
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["mx"]) == _oracle(
        spark, shards, {"mx": F.max("val")}
    )
    scanned, total = mv.last_recompute_files
    assert total >= 2  # both shards' snapshots considered


def test_exactly_once_replay_after_lost_property_advance(spark, tmp_path):
    """Crash-sim: roll the pinned vector back after a refresh; the next
    refresh recovers the cursor from the committed vector txn id (no
    double-apply) and heals the properties."""
    shards = _shards(spark, tmp_path)
    mv = _view(tmp_path, shards, rebuild_ratio=None)
    mv.build(spark)
    old_props = {
        mv._SRC_KEY.format(i=i): str(t.version())
        for i, t in enumerate(shards)
    }
    shards[0].append(spark.createDataFrame([(400, "g0", 10.0)], SCHEMA))
    mv.refresh(spark)
    want = _rows(mv.read(spark), ["n", "s"])
    # lose the property advance (the merge txn id survives)
    mv.view.alter_properties(old_props)
    mv.refresh(spark)  # must NOT double-apply the window
    assert _rows(mv.read(spark), ["n", "s"]) == want
    assert [h["op"] for h in mv.view.history()].count("merge") == 1
    # properties healed to the recovered vector
    snap = mv.view.snapshot()
    assert mv._cursor_vec(snap) == [t.version() for t in shards]


def test_shard_rewind_raises(spark, tmp_path):
    shards = _shards(spark, tmp_path)
    mv = _view(tmp_path, shards, rebuild_ratio=None)
    mv.build(spark)
    shards[0].append(spark.createDataFrame([(500, "g0", 1.0)], SCHEMA))
    mv.refresh(spark)
    shards[0].restore(shards[0].version() - 1)
    # restore COMMITS a new version, so this is a window with a restore
    # in it — and if the restore rewinds the logical state the cursor
    # math still sees versions move FORWARD; the replay must refuse
    with pytest.raises(MatviewWindowUnreadableError):
        mv.refresh(spark)


def test_definition_checks(spark, tmp_path):
    shards = _shards(spark, tmp_path)
    mv = _view(tmp_path, shards)
    mv.build(spark)
    # different shard ORDER is a different definition
    other = IncrementalUnionAggView(
        [shards[1], shards[0]],
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
    )
    with pytest.raises(MatviewDefinitionError):
        other.refresh(spark)
    with pytest.raises(ValueError, match="at least two"):
        IncrementalUnionAggView(
            [shards[0]], str(tmp_path / "mv2"), ["grp"], {"n": ("count", "1")}
        )
    with pytest.raises(ValueError, match="duplicate"):
        IncrementalUnionAggView(
            [shards[0], shards[0]],
            str(tmp_path / "mv2"),
            ["grp"],
            {"n": ("count", "1")},
        )


def test_cost_fallback_rebuilds_on_churn_heavy_window(spark, tmp_path):
    shards = _shards(spark, tmp_path)
    mv = _view(tmp_path, shards)  # default rebuild_ratio=1.0
    mv.build(spark)
    for t in shards:
        t.overwrite(t.read(spark).withColumn("val", F.col("val") + 1.0))
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "s"]) == _oracle(
        spark, shards, _add_aggs()
    )
    assert "overwrite" in [h["op"] for h in mv.view.history()]
    # and the rebuilt view keeps refreshing incrementally
    shards[1].append(spark.createDataFrame([(600, "g1", 3.0)], SCHEMA))
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "s"]) == _oracle(
        spark, shards, _add_aggs()
    )


def test_sql_aggregate_over_union(spark, tmp_path):
    """("sql", percentile) across shards: recompute-only, exact against
    the union oracle."""
    shards = _shards(spark, tmp_path)
    mv = _view(
        tmp_path,
        shards,
        aggs={"med": ("sql", "percentile(val, 0.5)")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    shards[0].append(spark.createDataFrame([(700, "g1", 50.0)], SCHEMA))
    mv.refresh(spark)
    assert mv.last_recompute_files is not None  # sql never folds
    assert _rows(mv.read(spark), ["med"]) == _oracle(
        spark, shards, {"med": F.expr("percentile(val, 0.5)")}
    )


# ------------------------------------------------------ model-based --
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_uniq = itertools.count()


@given(data=st.data())
@settings(
    max_examples=8,
    deadline=None,
    # tmp_path is function-scoped but reused across examples; every
    # example isolates itself in a unique subdir below
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_shard_dml_matches_union_oracle(spark, tmp_path, data):
    """Random interleavings of per-shard appends (new groups included),
    slice updates, slice deletes, and group deletes — on either shard —
    refreshed at random batch boundaries, must keep the view equal to a
    from-scratch aggregation of the union of the live shards (max in
    the aggregate set, so both the insert-only fold and the all-shard
    recompute are exercised)."""
    base = tmp_path / f"uex{next(_uniq)}"
    shards = []
    for i in range(2):
        t = TxLogTable(str(base / f"s{i}"))
        t.append(
            spark.createDataFrame(
                [
                    (j, f"g{j % 3}", float((j * 11) % 29))
                    for j in range(1, 25)
                    if j % 2 == i
                ],
                SCHEMA,
            )
        )
        t.alter_properties({"cdf.enabled": "true"})
        shards.append(t)
    aggs = {"n": ("count", "1"), "s": ("sum", "val"), "mx": ("max", "val")}
    oracle_aggs = {
        "n": F.count(F.lit(1)),
        "s": F.sum("val"),
        "mx": F.max("val"),
    }
    mv = IncrementalUnionAggView(
        shards,
        str(base / "mv"),
        ["grp"],
        aggs,
        rebuild_ratio=None,  # pin the incremental machinery under test
    )
    mv.build(spark)
    next_id = 1000
    n_ops = data.draw(st.integers(2, 5), label="n_ops")
    for step in range(n_ops):
        which = data.draw(st.integers(0, 1), label=f"shard{step}")
        t = shards[which]
        op = data.draw(st.integers(0, 3), label=f"op{step}")
        if op == 0:  # append (possibly a brand-new group)
            g = data.draw(st.integers(0, 4), label=f"g{step}")
            v = data.draw(
                st.sampled_from([0.0, 7.0, 40.0]), label=f"v{step}"
            )
            t.append(
                spark.createDataFrame([(next_id, f"g{g}", v)], SCHEMA)
            )
            next_id += 1
        elif op == 1:  # update a slice
            m = data.draw(st.integers(2, 5), label=f"m{step}")
            t.update(spark, f"id % {m} = 0", {"val": "val + 5"})
        elif op == 2:  # delete a slice (extremes may vanish)
            m = data.draw(st.integers(2, 6), label=f"d{step}")
            t.delete(spark, f"id % {m} = 1")
        else:  # delete a whole group from this shard
            g = data.draw(st.integers(0, 3), label=f"dg{step}")
            t.delete(spark, f"grp = 'g{g}'")
        if data.draw(st.booleans(), label=f"maint{step}"):
            mv.refresh(spark)
            assert _rows(mv.read(spark), ["n", "s", "mx"]) == _oracle(
                spark, shards, oracle_aggs
            )
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "s", "mx"]) == _oracle(
        spark, shards, oracle_aggs
    )
