"""Round-13 features:

- union-view shard membership evolution (attach_shard / detach_shard),
  including crash-between-fold-and-commit resume;
- additive matview definition evolution (alter(add_aggs=...)) on all
  four view kinds (typed refusal for top-k);
- self-healing streaming view maintenance (views_recover=True walks the
  recover() ladder per batch);
- register_tables(refresh=True);
- vacuum() refusing corrupted matview.pin.* properties;
- the _select_batch created-token guard.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.matview import (
    _ATTACH_PENDING_KEY,
    _DEF_KEY,
    _DETACH_PENDING_KEY,
    DimJoin,
    IncrementalAggView,
    IncrementalJoinAggView,
    IncrementalTopKView,
    IncrementalUnionAggView,
    MatviewDefinitionError,
    MatviewSourceSchemaError,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable

SCHEMA = "id long, grp string, val double"


def _shard(spark, path, rows):
    t = TxLogTable(str(path))
    t.append(spark.createDataFrame(rows, SCHEMA))
    t.alter_properties({"cdf.enabled": "true"})
    return t


def _mk_shards(spark, tmp_path, n=2):
    return [
        _shard(
            spark,
            tmp_path / f"s{i}",
            [
                (j, f"g{j % 3}", float(j))
                for j in range(1, 31)
                if j % n == i
            ],
        )
        for i in range(n)
    ]


def _union_oracle(spark, shards, aggs):
    u = None
    for t in shards:
        fr = t.read(spark)
        u = fr if u is None else u.unionByName(fr)
    agged = u.groupBy("grp").agg(*[e.alias(n) for n, e in aggs.items()])
    return {
        r["grp"]: tuple(
            round(r[c], 6) if isinstance(r[c], float) else r[c]
            for c in aggs
        )
        for r in agged.collect()
    }


def _read_rows(spark, mv, cols):
    return {
        r["grp"]: tuple(
            round(r[c], 6) if isinstance(r[c], float) else r[c]
            for c in cols
        )
        for r in mv.read(spark).collect()
    }


# ------------------------------------------------------ attach_shard --


def test_attach_shard_additive_then_refresh(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    new = _shard(
        spark,
        tmp_path / "s_new",
        [(100 + j, f"g{j % 3}", 1000.0 + j) for j in range(9)],
    )
    vec = mv.attach_shard(spark, new)
    assert len(vec) == 3 and len(mv.sources) == 3
    oracle = {"n": F.count(F.lit(1)), "s": F.sum("val")}
    assert _read_rows(spark, mv, ["n", "s"]) == _union_oracle(
        spark, mv.sources, oracle
    )
    # the attached shard is now maintained from its own CDF
    new.append(
        spark.createDataFrame([(200, "g0", 5.0), (201, "g1", 7.0)], SCHEMA)
    )
    shards[0].delete(spark, "id % 10 = 2")
    mv.refresh(spark)
    assert _read_rows(spark, mv, ["n", "s"]) == _union_oracle(
        spark, mv.sources, oracle
    )


def test_attach_shard_insert_only_fold_minmax(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 2)
    aggs = {"lo": ("min", "val"), "hi": ("max", "val")}
    mv = IncrementalUnionAggView(
        shards, str(tmp_path / "mv"), ["grp"], aggs, rebuild_ratio=None
    )
    mv.build(spark)
    new = _shard(
        spark, tmp_path / "s_new", [(500, "g0", -9.0), (501, "g2", 999.0)]
    )
    mv.attach_shard(spark, new)
    # the attach itself must be ONE merge (the insert-only fold), not a
    # recompute of anything beyond it
    assert _read_rows(spark, mv, ["lo", "hi"]) == _union_oracle(
        spark, mv.sources, {"lo": F.min("val"), "hi": F.max("val")}
    )


def test_attach_shard_sql_agg_recomputes(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 2)
    aggs = {"med": ("sql", "percentile(val, 0.5)")}
    mv = IncrementalUnionAggView(
        shards, str(tmp_path / "mv"), ["grp"], aggs, rebuild_ratio=None
    )
    mv.build(spark)
    new = _shard(
        spark,
        tmp_path / "s_new",
        [(600 + j, f"g{j % 3}", float(50 + j)) for j in range(6)],
    )
    mv.attach_shard(spark, new)
    assert _read_rows(spark, mv, ["med"]) == _union_oracle(
        spark, mv.sources, {"med": F.expr("percentile(val, 0.5)")}
    )


def test_attach_shard_refusals(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    with pytest.raises(ValueError, match="already a source"):
        mv.attach_shard(spark, shards[0])
    # schema-drift refusal: a shard that retypes a definition input
    drift = TxLogTable(str(tmp_path / "s_drift"))
    drift.append(
        spark.createDataFrame(
            [(1, "g0", "not-a-number")], "id long, grp string, val string"
        )
    )
    drift.alter_properties({"cdf.enabled": "true"})
    mv2 = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv2"),
        ["grp"],
        {"s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv2.build(spark)
    with pytest.raises(MatviewSourceSchemaError, match="RETYPES"):
        mv2.attach_shard(spark, drift)


def test_attach_shard_crash_before_fold_resume_exactly_once(
    spark, tmp_path
):
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    new = _shard(
        spark, tmp_path / "s_new", [(700, "g0", 3.0), (701, "g1", 4.0)]
    )
    # crash INJECTION: die inside the fold, before its commit — the
    # pending marker is set, nothing folded (the membership rider would
    # have cleared the pending atomically with the fold)
    real_merge = mv.view.merge

    def dying_merge(*a, **k):
        raise RuntimeError("simulated crash before fold commit")

    mv.view.merge = dying_merge
    with pytest.raises(RuntimeError, match="simulated crash"):
        mv.attach_shard(spark, new)
    mv.view.merge = real_merge
    # the view refuses maintenance until the attach completes
    fresh = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    with pytest.raises(MatviewDefinitionError, match="interrupted attach"):
        fresh.refresh(spark)
    with pytest.raises(MatviewDefinitionError, match="attach_shard"):
        fresh.read(spark)
    # re-running with the same table completes the attach — exactly ONE
    # merge commit lands (the fold + membership, atomically)
    fresh.attach_shard(spark, new)
    merges = sum(1 for h in fresh.view.history() if h["op"] == "merge")
    assert merges == 1, "fold must land exactly once"
    snap = fresh.view.snapshot()
    assert _ATTACH_PENDING_KEY not in snap.properties
    assert _read_rows(spark, fresh, ["n", "s"]) == _union_oracle(
        spark, fresh.sources, {"n": F.count(F.lit(1)), "s": F.sum("val")}
    )


def test_attach_shard_crash_after_fold_is_already_complete(
    spark, tmp_path
):
    """The membership rider makes the fold commit the COMPLETION: a
    crash after it leaves no partial state — no pending, definition
    already extended — and re-running attach_shard is an idempotent
    no-op (no second merge)."""
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    new = _shard(
        spark, tmp_path / "s_new", [(700, "g0", 3.0), (701, "g1", 4.0)]
    )
    real_merge = mv.view.merge

    def dying_merge(*a, **k):
        real_merge(*a, **k)
        raise RuntimeError("simulated crash after fold commit")

    mv.view.merge = dying_merge
    with pytest.raises(RuntimeError, match="simulated crash"):
        mv.attach_shard(spark, new)
    mv.view.merge = real_merge
    snap = mv.view.snapshot()
    assert _ATTACH_PENDING_KEY not in snap.properties, (
        "fold commit must clear the pending atomically"
    )
    assert json.loads(snap.properties[_DEF_KEY])["sources"] == [
        t.path for t in [*shards, new]
    ]
    # re-run with the PRE-attach handle: idempotent success, no new fold
    pre = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    vec = pre.attach_shard(spark, new)
    assert len(vec) == 3
    assert [t.path for t in pre.sources] == [
        t.path for t in [*shards, new]
    ]
    merges = sum(1 for h in pre.view.history() if h["op"] == "merge")
    assert merges == 1, "idempotent re-run must not fold again"
    assert _read_rows(spark, pre, ["n", "s"]) == _union_oracle(
        spark, pre.sources, {"n": F.count(F.lit(1)), "s": F.sum("val")}
    )


def test_attach_crash_recover_resumes_not_rebuilds(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    new = _shard(spark, tmp_path / "s_new", [(800, "g2", 1.0)])
    # crash before the fold commit: pending recorded, nothing folded
    mv.view.merge = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("crash")
    )
    with pytest.raises(RuntimeError):
        mv.attach_shard(spark, new)
    # recover() on an object constructed with the PRE-attach membership
    # (e.g. an unattended stream's views_recover hook) RESUMES the
    # half-finished attach from the recorded pending path — it must not
    # silently discard the in-flight membership change with a rebuild
    pre = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
    )
    pre.recover(spark)
    assert [t.path for t in pre.sources] == [
        t.path for t in [*shards, new]
    ]
    assert _read_rows(spark, pre, ["n"]) == _union_oracle(
        spark, pre.sources, {"n": F.count(F.lit(1))}
    )
    snap = pre.view.snapshot()
    assert _ATTACH_PENDING_KEY not in snap.properties
    ops = [h["op"] for h in pre.view.history()]
    assert ops.count("overwrite") == 0, f"resume must not rebuild: {ops}"


def test_attach_complete_stale_handle_recover_adopts(spark, tmp_path):
    """After a COMPLETED attach (atomic fold+membership commit), a
    handle still holding the pre-attach membership is merely stale:
    recover() must ADOPT the stored membership — never rebuild over it,
    which would discard the attached shard."""
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    new = _shard(spark, tmp_path / "s_new", [(800, "g2", 1.0)])
    mv.attach_shard(spark, new)
    # stale handle: pre-attach membership, view already evolved
    pre = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    with pytest.raises(MatviewDefinitionError):
        pre.refresh(spark)
    pre.recover(spark)
    assert [t.path for t in pre.sources] == [
        t.path for t in [*shards, new]
    ]
    ops = [h["op"] for h in pre.view.history()]
    assert ops.count("overwrite") == 0, f"adoption, not rebuild: {ops}"
    assert _read_rows(spark, pre, ["n", "s"]) == _union_oracle(
        spark, pre.sources, {"n": F.count(F.lit(1)), "s": F.sum("val")}
    )


def test_detach_crash_recover_resumes(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 3)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    # crash before the subtraction fold commits: pending recorded
    mv.view.merge = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("crash")
    )
    with pytest.raises(RuntimeError):
        mv.detach_shard(spark, shards[0])
    pre = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    pre.recover(spark)
    assert len(pre.sources) == 2
    assert _read_rows(spark, pre, ["n", "s"]) == _union_oracle(
        spark, pre.sources, {"n": F.count(F.lit(1)), "s": F.sum("val")}
    )


def test_alter_vacuumed_anchor_raises_typed_and_unlocks(spark, tmp_path):
    from bigdataingestion_spark.sinks.matview import (
        _PENDING_KEY,
        MatviewWindowUnreadableError,
    )

    src = _shard(spark, tmp_path / "t", [(1, "g0", 1.0), (2, "g1", 2.0)])
    mv = IncrementalAggView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)  # cursor pins the v0 snapshot
    src.overwrite(
        spark.createDataFrame([(9, "g0", 9.0)], SCHEMA)
    )  # v1 replaces v0's files
    src.vacuum(retention_seconds=0)  # v0's data files are gone
    with pytest.raises(MatviewWindowUnreadableError):
        mv.alter(spark, {"s": ("sum", "val")})
    # the failed alter left the view UNLOCKED and valid under the old
    # definition
    snap = mv.view.snapshot()
    assert snap.properties.get(_PENDING_KEY) != "true"
    assert "s" not in mv.aggs
    mv.read(spark)


def test_attach_cost_fallback_rebuilds_for_oversized_shard(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=1.0,  # the cost fallback is live
    )
    mv.build(spark)
    # a shard far larger than the whole membership: the fold cannot
    # beat one rescan — attach must route to build() (an overwrite),
    # not a merge
    big = _shard(
        spark,
        tmp_path / "s_big",
        [(10_000 + j, f"g{j % 3}", float(j)) for j in range(2000)],
    )
    vec = mv.attach_shard(spark, big)
    assert len(vec) == 3
    ops = [h["op"] for h in mv.view.history()]
    assert ops.count("merge") == 0, f"oversized attach must rebuild: {ops}"
    assert _read_rows(spark, mv, ["n", "s"]) == _union_oracle(
        spark, mv.sources, {"n": F.count(F.lit(1)), "s": F.sum("val")}
    )
    # and the vector stays maintainable afterwards
    big.delete(spark, "id % 2 = 0")
    mv.refresh(spark)
    assert _read_rows(spark, mv, ["n", "s"]) == _union_oracle(
        spark, mv.sources, {"n": F.count(F.lit(1)), "s": F.sum("val")}
    )


def test_detach_cost_fallback_rebuilds_from_remainder(spark, tmp_path):
    small = [
        _shard(spark, tmp_path / "s0", [(1, "g0", 1.0), (2, "g1", 2.0)]),
        _shard(spark, tmp_path / "s1", [(3, "g0", 3.0)]),
    ]
    big = _shard(
        spark,
        tmp_path / "s_big",
        [(100 + j, f"g{j % 3}", float(j)) for j in range(2000)],
    )
    mv = IncrementalUnionAggView(
        [*small, big],
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=1.0,
    )
    mv.build(spark)
    pre_merges = sum(1 for h in mv.view.history() if h["op"] == "merge")
    mv.detach_shard(spark, big)
    ops = [h["op"] for h in mv.view.history()]
    assert sum(1 for o in ops if o == "merge") == pre_merges, (
        f"oversized detach must rebuild from the remainder: {ops}"
    )
    assert _read_rows(spark, mv, ["n", "s"]) == _union_oracle(
        spark, mv.sources, {"n": F.count(F.lit(1)), "s": F.sum("val")}
    )
    # the fallback rebuild must drop the stale trailing pin exactly
    # like the fold path does — consumers read membership size off it
    snap = mv.view.snapshot()
    assert "matview.union.src.2.version" not in snap.properties


def test_attach_fallback_build_failure_restores_handle(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=1.0,
    )
    mv.build(spark)
    big = _shard(
        spark,
        tmp_path / "s_big",
        [(10_000 + j, f"g{j % 3}", float(j)) for j in range(2000)],
    )
    # the fallback's rebuild fails transiently: the handle must roll
    # back so a retry doesn't misread the shard as already attached
    real_overwrite = mv.view.overwrite
    mv.view.overwrite = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("transient")
    )
    with pytest.raises(RuntimeError, match="transient"):
        mv.attach_shard(spark, big)
    mv.view.overwrite = real_overwrite
    # the handle rolled back to the pre-attach membership, so the
    # interrupted-REBUILD remediation (recover -> build) reconstructs
    # exactly the state the stored definition describes — without the
    # rollback, recover() would rebuild WITH the never-attached shard
    assert len(mv.sources) == 2
    with pytest.raises(MatviewDefinitionError, match="interrupted rebuild"):
        mv.refresh(spark)
    mv.recover(spark)
    assert _read_rows(spark, mv, ["n"]) == _union_oracle(
        spark, mv.sources, {"n": F.count(F.lit(1))}
    )
    vec = mv.attach_shard(spark, big)  # retry succeeds
    assert len(vec) == 3
    assert _read_rows(spark, mv, ["n"]) == _union_oracle(
        spark, mv.sources, {"n": F.count(F.lit(1))}
    )


# ------------------------------------------------------ detach_shard --


def test_detach_shard_additive(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 3)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    # advance one shard so the applied vector is not all-build
    shards[1].append(spark.createDataFrame([(900, "g0", 2.5)], SCHEMA))
    mv.refresh(spark)
    rvec = mv.detach_shard(spark, shards[1])
    assert len(rvec) == 2 and len(mv.sources) == 2
    oracle = {"n": F.count(F.lit(1)), "s": F.sum("val")}
    assert _read_rows(spark, mv, ["n", "s"]) == _union_oracle(
        spark, mv.sources, oracle
    )
    # still maintainable afterwards
    mv.sources[0].delete(spark, "id % 7 = 3")
    mv.refresh(spark)
    assert _read_rows(spark, mv, ["n", "s"]) == _union_oracle(
        spark, mv.sources, oracle
    )


def test_detach_shard_minmax_recomputes_resurfaced_extreme(spark, tmp_path):
    # the detached shard holds the global max of g0: subtraction alone
    # cannot recover the runner-up — the recompute path must
    shards = [
        _shard(spark, tmp_path / "s0", [(1, "g0", 10.0), (2, "g1", 5.0)]),
        _shard(spark, tmp_path / "s1", [(3, "g0", 99.0), (4, "g1", 1.0)]),
        _shard(spark, tmp_path / "s2", [(5, "g0", 20.0), (6, "g1", 2.0)]),
    ]
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"hi": ("max", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    mv.detach_shard(spark, shards[1])
    got = _read_rows(spark, mv, ["hi"])
    assert got["g0"] == (20.0,) and got["g1"] == (5.0,)


def test_detach_shard_refusals(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    with pytest.raises(ValueError, match="single-source"):
        mv.detach_shard(spark, shards[0])
    stranger = _shard(spark, tmp_path / "s_x", [(1, "g0", 1.0)])
    with pytest.raises(ValueError, match="not a source"):
        mv.detach_shard(spark, stranger)


def test_detach_shard_crash_resume(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 3)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    # crash before the subtraction fold commits (the membership rider
    # would have completed the detach atomically with the fold)
    real_merge = mv.view.merge
    mv.view.merge = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash")
    )
    with pytest.raises(RuntimeError):
        mv.detach_shard(spark, shards[2])
    mv.view.merge = real_merge
    fresh = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    with pytest.raises(MatviewDefinitionError, match="interrupted detach"):
        fresh.refresh(spark)
    fresh.detach_shard(spark, shards[2])
    assert _read_rows(spark, fresh, ["n", "s"]) == _union_oracle(
        spark, fresh.sources, {"n": F.count(F.lit(1)), "s": F.sum("val")}
    )
    snap = fresh.view.snapshot()
    assert _DETACH_PENDING_KEY not in snap.properties
    # the stale trailing pin property was dropped
    assert "matview.union.src.2.version" not in snap.properties


def test_detach_shard_crash_after_fold_is_already_complete(
    spark, tmp_path
):
    """Detach mirror of the attach atomicity: a crash after the fold
    commit leaves the detach COMPLETE; re-running with the pre-detach
    handle is an idempotent no-op."""
    shards = _mk_shards(spark, tmp_path, 3)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    real_merge = mv.view.merge

    def dying_merge(*a, **k):
        real_merge(*a, **k)
        raise RuntimeError("simulated crash after fold commit")

    mv.view.merge = dying_merge
    with pytest.raises(RuntimeError, match="simulated crash"):
        mv.detach_shard(spark, shards[2])
    mv.view.merge = real_merge
    snap = mv.view.snapshot()
    assert _DETACH_PENDING_KEY not in snap.properties
    pre = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    rvec = pre.detach_shard(spark, shards[2])
    assert len(rvec) == 2
    assert [t.path for t in pre.sources] == [t.path for t in shards[:2]]
    merges = sum(1 for h in pre.view.history() if h["op"] == "merge")
    assert merges == 1, "idempotent re-run must not fold again"
    assert _read_rows(spark, pre, ["n", "s"]) == _union_oracle(
        spark, pre.sources, {"n": F.count(F.lit(1)), "s": F.sum("val")}
    )


def test_attach_shard_with_where_filter(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
        where="val >= 5",
    )
    mv.build(spark)
    new = _shard(
        spark,
        tmp_path / "s_new",
        [(100, "g0", 1.0), (101, "g1", 50.0), (102, "g2", 9.0)],
    )
    mv.attach_shard(spark, new)  # the fold must apply the view filter
    u = None
    for t in mv.sources:
        fr = t.read(spark)
        u = fr if u is None else u.unionByName(fr)
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in u.filter("val >= 5")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    got = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in mv.read(spark).collect()
    }
    assert got == want


def test_attach_shard_with_additive_extra_column(spark, tmp_path):
    # a shard carrying a column the definition never reads is ADDITIVE
    # drift — attach accepts it, and later refreshes union by name
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    new = TxLogTable(str(tmp_path / "s_new"))
    new.append(
        spark.createDataFrame(
            [(100, "g0", 2.0, "x")],
            "id long, grp string, val double, note string",
        )
    )
    new.alter_properties({"cdf.enabled": "true"})
    mv.attach_shard(spark, new)
    new.append(
        spark.createDataFrame(
            [(101, "g1", 3.0, "y")],
            "id long, grp string, val double, note string",
        )
    )
    mv.refresh(spark)
    got = _read_rows(spark, mv, ["n", "s"])
    u = None
    for t in mv.sources:
        fr = t.read(spark).select("grp", "val")
        u = fr if u is None else u.unionByName(fr)
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in u.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert got == want


def test_detach_then_reattach_same_shard(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 3)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    mv.detach_shard(spark, shards[1])
    # the shard moves on while detached, then rejoins at NEW content
    shards[1].append(spark.createDataFrame([(900, "g0", 4.5)], SCHEMA))
    mv.attach_shard(spark, shards[1])
    mv.sources[0].delete(spark, "id % 6 = 0")
    mv.refresh(spark)
    oracle = {"n": F.count(F.lit(1)), "s": F.sum("val")}
    assert _read_rows(spark, mv, ["n", "s"]) == _union_oracle(
        spark, mv.sources, oracle
    )


def test_alter_with_where_filter(spark, tmp_path):
    src = _shard(
        spark,
        tmp_path / "t",
        [(j, f"g{j % 2}", float(j)) for j in range(1, 21)],
    )
    mv = IncrementalAggView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
        where="val > 4",
    )
    mv.build(spark)
    mv.alter(spark, {"s": ("sum", "val")})  # backfill must be filtered
    src.append(spark.createDataFrame([(100, "g0", 2.0), (101, "g1", 8.0)],
                                     SCHEMA))
    mv.refresh(spark)
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in src.read(spark)
        .filter("val > 4")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    got = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in mv.read(spark).collect()
    }
    assert got == want


# ------------------------------------------------- alter(add_aggs=) --


def test_alter_add_aggs_single_source(spark, tmp_path):
    src = _shard(
        spark,
        tmp_path / "t",
        [(j, f"g{j % 3}", float(j)) for j in range(1, 31)],
    )
    mv = IncrementalAggView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    src.append(spark.createDataFrame([(100, "g0", 50.0)], SCHEMA))
    mv.refresh(spark)
    cur = mv.alter(
        spark,
        {"s": ("sum", "val"), "lo": ("min", "val"),
         "med": ("sql", "percentile(val, 0.5)")},
    )
    assert cur == src.version()
    # post-alter maintenance covers every new aggregate's path
    src.append(spark.createDataFrame([(101, "g1", -5.0)], SCHEMA))
    src.delete(spark, "id = 3")
    mv.refresh(spark)
    oracle = {
        "n": F.count(F.lit(1)),
        "s": F.sum("val"),
        "lo": F.min("val"),
        "med": F.expr("percentile(val, 0.5)"),
    }
    got = _read_rows(spark, mv, ["n", "s", "lo", "med"])
    want = _union_oracle(spark, [src], oracle)
    assert got == want


def test_alter_refusals(spark, tmp_path):
    src = _shard(spark, tmp_path / "t", [(1, "g0", 1.0)])
    mv = IncrementalAggView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    with pytest.raises(ValueError, match="collides"):
        mv.alter(spark, {"n": ("sum", "val")})
    with pytest.raises(ValueError, match="collides"):
        mv.alter(spark, {"grp": ("sum", "val")})
    with pytest.raises(ValueError, match="at least one"):
        mv.alter(spark, {})
    with pytest.raises(MatviewDefinitionError, match="resolve"):
        mv.alter(spark, {"bad": ("sum", "no_such_column")})
    # the failed alters left the view untouched and maintainable
    mv.refresh(spark)
    assert _read_rows(spark, mv, ["n"]) == {"g0": (1,)}


def test_alter_topk_typed_refusal(spark, tmp_path):
    src = _shard(spark, tmp_path / "t", [(1, "g0", 1.0), (2, "g0", 2.0)])
    tk = IncrementalTopKView(
        src,
        str(tmp_path / "tk"),
        ["grp"],
        order_by="val",
        payload=["id"],
        k=1,
        rebuild_ratio=None,
    )
    tk.build(spark)
    with pytest.raises(MatviewDefinitionError, match="top-k"):
        tk.alter(spark, {"s": ("sum", "val")})


def test_alter_join_view_with_dim_column(spark, tmp_path):
    fact = _shard(
        spark,
        tmp_path / "fact",
        [(j, f"g{j % 2}", float(j)) for j in range(1, 21)],
    )
    dim = TxLogTable(str(tmp_path / "dim"))
    dim.append(
        spark.createDataFrame(
            [("g0", 2.0), ("g1", 3.0)], "dgrp string, rate double"
        )
    )
    mv = IncrementalJoinAggView(
        fact,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        dims=[DimJoin(dim, on=[("grp", "dgrp")], select=["rate"])],
        rebuild_ratio=None,
    )
    mv.build(spark)
    # the new aggregate references a CARRIED dim column
    mv.alter(spark, {"weighted": ("sum", "val * rate")})
    fact.append(spark.createDataFrame([(100, "g1", 10.0)], SCHEMA))
    mv.refresh(spark)
    want = {
        r["grp"]: (r["n"], round(r["weighted"], 6))
        for r in fact.read(spark)
        .join(dim.read(spark), F.col("grp") == F.col("dgrp"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("val * rate")).alias("weighted"),
        )
        .collect()
    }
    got = {
        r["grp"]: (r["n"], round(r["weighted"], 6))
        for r in mv.read(spark).collect()
    }
    assert got == want


def test_alter_union_view(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    shards[0].append(spark.createDataFrame([(300, "g2", 8.0)], SCHEMA))
    mv.refresh(spark)
    vec = mv.alter(spark, {"s": ("sum", "val")})
    assert vec == [t.version() for t in shards]
    shards[1].delete(spark, "id % 5 = 0")
    mv.refresh(spark)
    assert _read_rows(spark, mv, ["n", "s"]) == _union_oracle(
        spark, shards, {"n": F.count(F.lit(1)), "s": F.sum("val")}
    )


def test_alter_crash_recover_rebuilds_with_new_definition(spark, tmp_path):
    src = _shard(spark, tmp_path / "t", [(1, "g0", 1.0), (2, "g1", 2.0)])
    mv = IncrementalAggView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    real_alter = mv.view.alter_properties

    def dying_alter(props):
        if _DEF_KEY in props:
            raise RuntimeError("simulated crash")
        return real_alter(props)

    mv.view.alter_properties = dying_alter
    with pytest.raises(RuntimeError):
        mv.alter(spark, {"s": ("sum", "val")})
    mv.view.alter_properties = real_alter
    # interrupted between overwrite and definition commit: pending flag
    # refuses refresh; recover() rebuilds under the object's (post-
    # alter) definition
    with pytest.raises(MatviewDefinitionError, match="pending"):
        mv.refresh(spark)
    assert "s" in mv.aggs  # the object already carries the new aggs
    mv.recover(spark)
    assert _read_rows(spark, mv, ["n", "s"]) == {
        "g0": (1, 1.0),
        "g1": (1, 2.0),
    }


@pytest.mark.parametrize(
    "seed,aggs",
    [
        (7, {"n": ("count", "1"), "s": ("sum", "val")}),      # additive
        (23, {"n": ("count", "1"), "hi": ("max", "val")}),    # recompute
    ],
)
def test_membership_evolution_randomized_sequence(spark, tmp_path, seed, aggs):
    """Seeded random interleaving of DML / refresh / attach / detach —
    after a final recover()+refresh the view must equal a from-scratch
    aggregate of the CURRENT membership, for both the additive and the
    recompute maintenance families."""
    import random

    rng = random.Random(seed)
    base = tmp_path / f"seed{seed}"
    base.mkdir()
    next_id = [1000]

    def rows(n, lo=0.0):
        out = [
            (next_id[0] + i, f"g{(next_id[0] + i) % 3}",
             lo + float(next_id[0] + i) % 97)
            for i in range(n)
        ]
        next_id[0] += n
        return out

    def mk(name, n):
        t = TxLogTable(str(base / name))
        t.append(spark.createDataFrame(rows(n), SCHEMA))
        t.alter_properties({"cdf.enabled": "true"})
        return t

    members = [mk("s0", 12), mk("s1", 12)]
    pool = [mk("p0", 6), mk("p1", 6)]
    mv = IncrementalUnionAggView(
        members, str(base / "mv"), ["grp"], aggs, rebuild_ratio=None
    )
    mv.build(spark)
    for _ in range(8):
        op = rng.choice(
            ["append", "delete", "update", "refresh", "attach", "detach"]
        )
        if op == "append":
            rng.choice(mv.sources).append(
                spark.createDataFrame(rows(4), SCHEMA)
            )
        elif op == "delete":
            rng.choice(mv.sources).delete(
                spark, f"id % 5 = {rng.randrange(5)}"
            )
        elif op == "update":
            rng.choice(mv.sources).update(
                spark,
                f"id % 4 = {rng.randrange(4)}",
                {"val": "val + 1"},
            )
        elif op == "refresh":
            mv.refresh(spark)
        elif op == "attach" and pool:
            mv.attach_shard(spark, pool.pop())
        elif op == "detach" and len(mv.sources) > 2:
            t = rng.choice(mv.sources)
            mv.detach_shard(spark, t)
            pool.append(t)
    mv.recover(spark)
    mv.refresh(spark)
    exprs = {
        k: (F.count(F.lit(1)) if fn == "count"
            else F.sum(expr) if fn == "sum"
            else F.max(expr))
        for k, (fn, expr) in aggs.items()
    }
    assert _read_rows(spark, mv, list(aggs)) == _union_oracle(
        spark, mv.sources, exprs
    )


def test_recover_supersedes_corrupted_pending(spark, tmp_path):
    shards = _mk_shards(spark, tmp_path, 2)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    # a corrupted pending record must neither wedge refresh with a raw
    # JSON error nor wedge recover(): typed refusal, then build supersede
    mv.view.alter_properties(
        {_ATTACH_PENDING_KEY: "{truncated-not-json"}
    )
    with pytest.raises(MatviewDefinitionError, match="corrupted pending"):
        mv.refresh(spark)
    mv.recover(spark)
    snap = mv.view.snapshot()
    assert _ATTACH_PENDING_KEY not in snap.properties
    assert _read_rows(spark, mv, ["n"]) == _union_oracle(
        spark, mv.sources, {"n": F.count(F.lit(1))}
    )


# ------------------------------------------- streaming views_recover --


def test_stream_views_recover_heals_moved_dim(spark, tmp_path):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import StreamingQueryException

    from bigdataingestion_spark.streaming.ingest import stream_txlog_ingest

    src = tmp_path / "src"
    spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(20)],
        "id bigint, cat bigint, amt double",
    ).coalesce(1).write.mode("append").parquet(str(src))

    dim = TxLogTable(str(tmp_path / "dim"))
    dim.append(
        spark.createDataFrame(
            [(c, f"C{c % 2}", 1.0) for c in range(4)],
            "cat_id bigint, bucket string, rate double",
        )
    )
    dim.alter_properties({"cdf.enabled": "true"})
    target, ckpt = str(tmp_path / "fact"), str(tmp_path / "ckpt")
    fact = TxLogTable(target)
    fact.append(
        spark.createDataFrame([], "id bigint, cat bigint, amt double")
    )
    fact.alter_properties({"cdf.enabled": "true"})
    mv = IncrementalJoinAggView(
        fact,
        str(tmp_path / "mv"),
        ["bucket"],
        {"n": ("count", "1"), "s": ("sum", "amt")},
        dims=[DimJoin(dim, on=[("cat", "cat_id")], select=["bucket"])],
        rebuild_ratio=None,
    )
    mv.build(spark)
    q = stream_txlog_ingest(
        spark, str(src), target, ckpt, max_files_per_trigger=1,
        views=[mv], views_recover=True,
    )
    assert q.awaitTermination(180)

    # out-of-band DIM MOVE between stream runs: a plain refresh would
    # raise MatviewStaleDimensionError and fail every batch retry
    dim.update(spark, "cat_id = 1", {"bucket": "'C9'"})
    spark.createDataFrame(
        [(100 + i, i % 4, float(i)) for i in range(8)],
        "id bigint, cat bigint, amt double",
    ).coalesce(1).write.mode("append").parquet(str(src))

    # control: without recover the batch fails into the dim wall.
    # SAME checkpoint: its batch may have appended before the view
    # refresh died — the healing run replays it as a txn no-op
    q_fail = stream_txlog_ingest(
        spark, str(src), target, ckpt, max_files_per_trigger=1,
        views=[mv], views_recover=False,
    )
    with pytest.raises((StreamingQueryException, Py4JJavaError)):
        q_fail.awaitTermination(180)

    q2 = stream_txlog_ingest(
        spark, str(src), target, ckpt, max_files_per_trigger=1,
        views=[mv], views_recover=True,
    )
    assert q2.awaitTermination(180)
    want = {
        r["bucket"]: (r["n"], round(r["s"], 6))
        for r in fact.read(spark)
        .join(dim.read(spark), F.col("cat") == F.col("cat_id"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amt").alias("s"))
        .collect()
    }
    got = {
        r["bucket"]: (r["n"], round(r["s"], 6))
        for r in mv.read(spark).collect()
    }
    assert got == want


def test_stream_views_recover_survives_additive_schema_add(spark, tmp_path):
    from bigdataingestion_spark.streaming.ingest import stream_txlog_ingest

    src = tmp_path / "src"
    spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id bigint, amt double"
    ).coalesce(1).write.mode("append").parquet(str(src))
    target, ckpt = str(tmp_path / "fact"), str(tmp_path / "ckpt")
    fact = TxLogTable(target)
    fact.append(spark.createDataFrame([], "id bigint, amt double"))
    fact.alter_properties({"cdf.enabled": "true"})
    mv = IncrementalAggView(
        fact,
        str(tmp_path / "mv"),
        ["id"],
        {"s": ("sum", "amt")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    q = stream_txlog_ingest(
        spark, str(src), target, ckpt, views=[mv], views_recover=True
    )
    assert q.awaitTermination(180)
    # out-of-band ADDITIVE schema add on the view's source between
    # stream runs — the r12 contract refreshes through it, recover()'s
    # first rung suffices (no rebuild)
    fact.append(
        spark.createDataFrame(
            [(100, 1.0, "x")], "id bigint, amt double, note string"
        ),
        merge_schema=True,
    )
    spark.createDataFrame(
        [(200, 2.0)], "id bigint, amt double"
    ).coalesce(1).write.mode("append").parquet(str(src))
    q2 = stream_txlog_ingest(
        spark, str(src), target, ckpt, views=[mv], views_recover=True
    )
    assert q2.awaitTermination(180)
    want = {
        r["id"]: round(r["s"], 6)
        for r in fact.read(spark)
        .groupBy("id")
        .agg(F.sum("amt").alias("s"))
        .collect()
    }
    got = {r["id"]: round(r["s"], 6) for r in mv.read(spark).collect()}
    assert got == want


# ---------------------------------------------- register_tables refresh --


def test_register_tables_refresh_recovers_before_publish(spark, tmp_path):
    from bigdataingestion_spark.sql_registry import (
        register_tables,
        unregister_tables,
    )

    src = _shard(
        spark, tmp_path / "t", [(j, f"g{j % 2}", float(j)) for j in range(8)]
    )
    mv = IncrementalAggView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    src.append(spark.createDataFrame([(100, "g0", 1.0)], SCHEMA))
    # stale without refresh
    register_tables(spark, {"r13_stale": mv})
    stale = {
        r["grp"]: r["n"]
        for r in spark.sql("SELECT grp, n FROM r13_stale").collect()
    }
    assert stale["g0"] == 4
    # refresh=True recovers (here: plain refresh rung) before publish
    versions = register_tables(spark, {"r13_fresh": mv}, refresh=True)
    fresh = {
        r["grp"]: r["n"]
        for r in spark.sql("SELECT grp, n FROM r13_fresh").collect()
    }
    assert fresh["g0"] == 5
    assert versions["r13_fresh"] == mv.view.version()
    unregister_tables(spark, ["r13_stale", "r13_fresh"])


# -------------------------------------------------- vacuum pin refusal --


def test_vacuum_refuses_corrupted_pin(spark, tmp_path):
    t = _shard(spark, tmp_path / "t", [(1, "g0", 1.0)])
    t.alter_properties({"matview.pin.abc": "garbage"})
    with pytest.raises(ValueError, match="unparseable"):
        t.vacuum(retention_seconds=0)
    t.alter_properties({"matview.pin.abc": "999"})
    with pytest.raises(ValueError, match="outside this table's history"):
        t.vacuum(retention_seconds=0)
    t.alter_properties({"matview.pin.abc": None})
    t.vacuum(retention_seconds=0)  # clean again


# -------------------------------------------- _select_batch alias guard --


def test_select_batch_stops_at_created_token_alias():
    from bigdataingestion_spark.operators.vocab import _select_batch

    # selecting (a, b) creates token "ab", which the window uses as a
    # SYMBOL — counts of pairs touching "ab" can INCREASE after the
    # merge, so the batch must stop right after the (still-valid)
    # creating pair, leaving the rest to the next recounted pass
    rows = [
        {"lhs": "a", "rhs": "b", "pair_freq": 100},   # creates "ab"
        {"lhs": "c", "rhs": "d", "pair_freq": 90},
        {"lhs": "ab", "rhs": "e", "pair_freq": 80},   # uses symbol "ab"
        {"lhs": "f", "rhs": "g", "pair_freq": 70},
    ]
    out = _select_batch(rows, probe=64, min_freq=1, limit=16)
    assert out == [("a", "b")]
    # the mirror direction: a pair USING "ab" selected first, then the
    # pair CREATING "ab" — commit both (pre-batch counts valid for
    # each), but nothing after (pairs touching "ab" may have grown)
    rows2 = [
        {"lhs": "ab", "rhs": "e", "pair_freq": 100},
        {"lhs": "a", "rhs": "b", "pair_freq": 90},    # creates "ab"
        {"lhs": "q", "rhs": "r", "pair_freq": 85},    # must NOT commit
    ]
    out2 = _select_batch(rows2, probe=64, min_freq=1, limit=16)
    assert out2 == [("ab", "e"), ("a", "b")]
    # TWIN creation: two symbol-disjoint decompositions of one token —
    # their created pairs POOL, so nothing after the second may commit
    rows3 = [
        {"lhs": "a", "rhs": "bc", "pair_freq": 100},  # creates "abc"
        {"lhs": "ab", "rhs": "c", "pair_freq": 95},   # creates "abc" too
        {"lhs": "q", "rhs": "r", "pair_freq": 60},    # must NOT commit
    ]
    out3 = _select_batch(rows3, probe=64, min_freq=1, limit=16)
    assert out3 == [("a", "bc"), ("ab", "c")]
