"""Pin-aware dimension vacuum + one-call recover() (r12).

A join view's incremental correctness depends on its PINNED dimension
snapshots staying readable. Two remedies under test:

- ``register_pins=True`` records the pin as a ``matview.pin.<view-id>``
  property ON the dimension, which ``TxLogTable.vacuum()`` honors as a
  retention floor — the pinned snapshot and the dim's change history
  since it survive any vacuum, so refresh_dimensions() keeps working.
- ``recover()`` is the one-call remediation ladder for views that DID
  break (no pins registered, floor removed, window vacuumed): refresh →
  incremental dim fold → full rebuild, cheapest rung that works.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.matview import (
    DimJoin,
    IncrementalAggView,
    IncrementalJoinAggView,
    MatviewStaleDimensionError,
    MatviewWindowUnreadableError,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable


def _fixture(spark, tmp_path, register_pins):
    fact = TxLogTable(str(tmp_path / "fact"))
    fact.append(
        spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(1, 41)],
            "id long, dk long, amount double",
        )
    )
    fact.alter_properties({"cdf.enabled": "true"})
    dim = TxLogTable(str(tmp_path / "dim"))
    dim.append(
        spark.createDataFrame(
            [(k, f"D{k % 2}") for k in range(4)], "dkey long, dname string"
        )
    )
    dim.alter_properties({"cdf.enabled": "true"})
    mv = IncrementalJoinAggView(
        fact,
        str(tmp_path / "mv"),
        ["dname"],
        {"n": ("count", "1"), "s": ("sum", "amount")},
        [DimJoin(dim, on=[("dk", "dkey")])],
        rebuild_ratio=None,
        register_pins=register_pins,
    )
    mv.build(spark)
    return fact, dim, mv


def _oracle(spark, fact, dim):
    j = fact.read(spark).join(
        dim.read(spark), F.col("dk") == F.col("dkey")
    )
    return {
        r["dname"]: (r["n"], round(r["s"], 6))
        for r in j.groupBy("dname")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s"))
        .collect()
    }


def _state(mv, spark):
    return {
        r["dname"]: (r["n"], round(r["s"], 6))
        for r in mv.read(spark).collect()
    }


def test_vacuum_honors_pin_floor(spark, tmp_path):
    """Dim moves (rewrite), then a zero-retention vacuum runs: with a
    registered pin the pinned snapshot and the CDF window survive, so
    the incremental dim fold (not a rebuild) still works afterwards."""
    fact, dim, mv = _fixture(spark, tmp_path, register_pins=True)
    key = mv._pin_key()
    assert key in dim.snapshot().properties  # build registered the floor
    dim.update(spark, "dkey = 3", {"dname": "'D0'"})  # rewrites a file
    dim.vacuum(retention_seconds=0)
    # the pinned snapshot must still be fully readable post-vacuum
    pinned = mv._pinned_dim_versions(mv.view.snapshot())[0]
    snap = dim.snapshot(pinned)
    assert all(
        os.path.exists(os.path.join(dim.path, f)) for f in snap.files
    )
    mv.refresh_dimensions(spark)
    ops = [h["op"] for h in mv.view.history()]
    assert "overwrite" not in ops[-3:]  # incremental fold, no rebuild
    assert _state(mv, spark) == _oracle(spark, fact, dim)


def test_repin_advances_floor_and_releases_history(spark, tmp_path):
    """refresh_dimensions re-registers the floor at the new version;
    a later vacuum may then reclaim pre-fold dim files — the floor is
    a moving window, not an ever-growing archive."""
    fact, dim, mv = _fixture(spark, tmp_path, register_pins=True)
    old_files = set(dim.snapshot().files)
    dim.update(spark, "dkey = 3", {"dname": "'D0'"})
    mv.refresh_dimensions(spark)
    deleted = dim.vacuum(retention_seconds=0)
    # the rewritten pre-fold file is reclaimable once the pin moved past
    assert any(f in old_files for f in deleted)
    assert _state(mv, spark) == _oracle(spark, fact, dim)


def test_unpin_releases_floor(spark, tmp_path):
    fact, dim, mv = _fixture(spark, tmp_path, register_pins=True)
    key = mv._pin_key()
    mv.unpin_dims()
    assert key not in dim.snapshot().properties
    # idempotent when nothing is pinned
    mv.unpin_dims()


def test_vacuum_without_pin_breaks_then_recover(spark, tmp_path):
    """The default (no pins): dim rewrite + zero-retention vacuum
    strands the pinned snapshot; refresh refuses (stale dim), the
    incremental fold refuses (vacuumed window), and recover() walks the
    ladder down to a rebuild — after which incremental refresh works
    again."""
    fact, dim, mv = _fixture(spark, tmp_path, register_pins=False)
    dim.update(spark, "dkey = 3", {"dname": "'D0'"})
    dim.vacuum(retention_seconds=0)
    with pytest.raises(MatviewStaleDimensionError):
        mv.refresh(spark)
    with pytest.raises(MatviewWindowUnreadableError):
        mv.refresh_dimensions(spark)
    mv.recover(spark)
    assert _state(mv, spark) == _oracle(spark, fact, dim)
    fact.append(
        spark.createDataFrame([(100, 1, 9.0)], "id long, dk long, amount double")
    )
    mv.refresh(spark)
    assert _state(mv, spark) == _oracle(spark, fact, dim)


def test_recover_prefers_incremental_dim_fold(spark, tmp_path):
    """When the dim window IS replayable, recover() must take the
    incremental rung (refresh_dimensions + refresh), never a rebuild."""
    fact, dim, mv = _fixture(spark, tmp_path, register_pins=True)
    dim.update(spark, "dkey = 2", {"dname": "'D1'"})
    fact.append(
        spark.createDataFrame([(100, 2, 5.0)], "id long, dk long, amount double")
    )
    mv.recover(spark)
    ops = [h["op"] for h in mv.view.history()]
    assert "overwrite" not in ops[1:]  # no rebuild after the first build
    assert _state(mv, spark) == _oracle(spark, fact, dim)


def test_recover_on_agg_view_vacuumed_window(spark, tmp_path):
    """Base-class recover(): a source DML window whose CDF images were
    vacuumed is unreplayable — recover() rebuilds and re-anchors."""
    src = TxLogTable(str(tmp_path / "src"))
    src.append(
        spark.createDataFrame(
            [(i, f"g{i % 3}", float(i)) for i in range(1, 31)],
            "id long, grp string, val double",
        )
    )
    src.alter_properties({"cdf.enabled": "true"})
    mv = IncrementalAggView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    src.update(spark, "id % 5 = 0", {"val": "val * 2"})
    src.vacuum(retention_seconds=0)  # reclaims the update's CDF images
    with pytest.raises(MatviewWindowUnreadableError):
        mv.refresh(spark)
    mv.recover(spark)
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in src.read(spark)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in mv.read(spark).collect()
    } == want


def test_recover_builds_never_built_view(spark, tmp_path):
    src = TxLogTable(str(tmp_path / "src"))
    src.append(spark.createDataFrame([(1, "g0", 1.0)], "id long, grp string, val double"))
    mv = IncrementalAggView(
        src, str(tmp_path / "mv"), ["grp"], {"n": ("count", "1")}
    )
    mv.recover(spark)
    assert _rows_n(mv, spark) == {"g0": 1}


def _rows_n(mv, spark):
    return {r["grp"]: r["n"] for r in mv.read(spark).collect()}


# ------------------------------------------- r12 review regressions --


def test_floor_survives_failed_dim_fold(spark, tmp_path, monkeypatch):
    """r12 review finding: the vacuum floor must advance only AFTER the
    dim fold commits — a failure mid-fold leaves the OLD floor
    protecting the snapshot the view still reflects, so a subsequent
    vacuum cannot strand it and the retry folds incrementally."""
    fact, dim, mv = _fixture(spark, tmp_path, register_pins=True)
    key = mv._pin_key()
    old_floor = dim.snapshot().properties[key]
    dim.update(spark, "dkey = 3", {"dname": "'D0'"})

    def boom(*a, **kw):
        raise RuntimeError("injected mid-fold failure")

    monkeypatch.setattr(
        type(mv), "_recompute_groups", boom, raising=True
    )
    with pytest.raises(RuntimeError, match="injected"):
        mv.refresh_dimensions(spark)
    # the floor did NOT move: the still-pinned snapshot stays protected
    assert dim.snapshot().properties[key] == old_floor
    dim.vacuum(retention_seconds=0)
    pinned = mv._pinned_dim_versions(mv.view.snapshot())[0]
    snap = dim.snapshot(pinned)
    assert all(
        os.path.exists(os.path.join(dim.path, f)) for f in snap.files
    )
    monkeypatch.undo()
    mv.refresh_dimensions(spark)  # retry: incremental fold succeeds
    ops = [h["op"] for h in mv.view.history()]
    assert "overwrite" not in ops[1:]
    assert _state(mv, spark) == _oracle(spark, fact, dim)
    # ... and only the SUCCESSFUL fold advanced the floor
    assert dim.snapshot().properties[key] != old_floor


def test_metadata_only_dim_movement_tolerated(spark, tmp_path):
    """A property commit on a dimension (cdf enablement, someone
    else's pin, a constraint) is data-identical at the pinned read —
    refresh() must NOT bounce through refresh_dimensions for it."""
    fact, dim, mv = _fixture(spark, tmp_path, register_pins=False)
    dim.alter_properties({"some.marker": "x"})
    fact.append(
        spark.createDataFrame([(100, 1, 9.0)], "id long, dk long, amount double")
    )
    mv.refresh(spark)  # would raise MatviewStaleDimensionError before r12
    assert _state(mv, spark) == _oracle(spark, fact, dim)


def test_dim_join_key_retype_refused(spark, tmp_path):
    """r12 review finding: the DIM side of a join key is part of the
    schema contract too — a dim overwrite retyping its key column
    (long → string) implicit-casts through the equi-join, so the probe
    pins it and refresh_dimensions refuses."""
    from bigdataingestion_spark.sinks.matview import MatviewSourceSchemaError

    fact, dim, mv = _fixture(spark, tmp_path, register_pins=False)
    dim.overwrite(
        spark.createDataFrame(
            [(str(k), f"D{k % 2}") for k in range(4)],
            "dkey string, dname string",
        )
    )
    with pytest.raises(MatviewSourceSchemaError, match="RETYPE"):
        mv.refresh_dimensions(spark)


def test_pin_floor_keeps_dv_sidecars(spark, tmp_path):
    """r12 review finding: a post-pin deletion-vector sidecar must
    survive vacuum like the files it masks — read_cdf's overwrite
    branch reads removed files under the PRE-commit dv state, so the
    window replay needs it."""
    fact, dim, mv = _fixture(spark, tmp_path, register_pins=True)
    dim.delete(spark, "dkey = 1", deletion_vectors=True)
    dim.overwrite(
        spark.createDataFrame(
            [(k, f"D{k % 2}") for k in range(4)], "dkey long, dname string"
        )
    )
    dim.vacuum(retention_seconds=0)
    mv.refresh_dimensions(spark)  # replays the dv-delete + overwrite window
    assert _state(mv, spark) == _oracle(spark, fact, dim)


def test_register_tables_validates_before_publishing(spark, tmp_path):
    """r12 review finding: a bad entry must not leave earlier names
    already (re-)registered — the dict validates before any side
    effect."""
    from bigdataingestion_spark.sinks.txlog import TxLogTable
    from bigdataingestion_spark.sql_registry import register_tables

    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(TypeError):
        register_tables(spark, {"bdi_reg_good": t, "bdi_reg_bad": 42})
    assert not any(
        v.name == "bdi_reg_good" for v in spark.catalog.listTables()
    )


# -------------------------------------- r12 second-review regressions --


def test_build_floor_advances_only_after_publish(spark, tmp_path, monkeypatch):
    """Second-review finding: build() must not move the floor before
    its publish commit — a failed REBUILD leaves refresh() working
    against the OLD pins, so those must stay vacuum-protected."""
    fact, dim, mv = _fixture(spark, tmp_path, register_pins=True)
    key = mv._pin_key()
    old_floor = dim.snapshot().properties[key]
    dim.append(spark.createDataFrame([(9, "D1")], "dkey long, dname string"))

    def boom(*a, **kw):
        raise RuntimeError("injected pre-publish failure")

    monkeypatch.setattr(type(mv), "_build_state", boom, raising=True)
    with pytest.raises(RuntimeError, match="injected"):
        mv.build(spark)
    assert dim.snapshot().properties[key] == old_floor  # floor untouched
    monkeypatch.undo()
    # the OLD state is still live and vacuum-safe: the pinned snapshot
    # survives a zero-retention vacuum, so the INCREMENTAL dim fold
    # (not a rebuild) digests the movement the failed build left behind
    dim.vacuum(retention_seconds=0)
    mv.refresh_dimensions(spark)
    ops = [h["op"] for h in mv.view.history()]
    assert "overwrite" not in ops[1:]
    fact.append(
        spark.createDataFrame([(100, 1, 9.0)], "id long, dk long, amount double")
    )
    mv.refresh(spark)
    assert _state(mv, spark) == _oracle(spark, fact, dim)
    # ... and the successful fold advanced the floor
    assert dim.snapshot().properties[key] != old_floor


def test_metadata_window_healed_forward(spark, tmp_path):
    """Second-review finding: tolerated metadata-only dim movement must
    CONVERGE — the first refresh heals the stored pins forward so later
    refreshes stop re-scanning the trailing metadata commits."""
    fact, dim, mv = _fixture(spark, tmp_path, register_pins=False)
    dim.alter_properties({"some.marker": "1"})
    dim.alter_properties({"some.marker": "2"})
    cur = dim.version()
    fact.append(
        spark.createDataFrame([(100, 1, 9.0)], "id long, dk long, amount double")
    )
    mv.refresh(spark)
    stored = int(
        mv.view.snapshot().properties[mv._DIM_KEY.format(i=0)]
    )
    assert stored == cur  # healed to the tolerated current version
    assert _state(mv, spark) == _oracle(spark, fact, dim)


def test_window_is_metadata_only_taxonomy(spark, tmp_path):
    """The classification lives on the txlog, beside its sibling
    window_is_insert_only: property windows pass, data/schema/layout
    windows fail."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    v0 = t.version()
    t.alter_properties({"x": "1"})
    t.add_constraint(spark, "c_pos", "id > 0")
    assert t.window_is_metadata_only(v0, t.version())
    v1 = t.version()
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    assert not t.window_is_metadata_only(v1, t.version())
    v2 = t.version()
    t.compact(spark)
    assert not t.window_is_metadata_only(v2, t.version())


def test_register_tables_bad_at_version_publishes_nothing(spark, tmp_path):
    """Second-review finding (reproduced by the reviewer): a bad at=
    version must not leave EARLIER names re-registered — every frame
    resolves before any name publishes."""
    from bigdataingestion_spark.sql_registry import register_tables

    t1 = TxLogTable(str(tmp_path / "t1"))
    t1.append(spark.createDataFrame([(1,)], "id long"))
    t2 = TxLogTable(str(tmp_path / "t2"))
    t2.append(spark.createDataFrame([(2,)], "id long"))
    with pytest.raises(Exception):
        register_tables(
            spark, {"bdi_tt_a": t1, "bdi_tt_b": t2}, at={"bdi_tt_b": 999}
        )
    assert not any(
        v.name == "bdi_tt_a" for v in spark.catalog.listTables()
    )
    with pytest.raises(ValueError):
        register_tables(
            spark, {"bdi_tt_a": t1}, at={"bdi_tt_a": "garbage"}
        )
    assert not any(
        v.name == "bdi_tt_a" for v in spark.catalog.listTables()
    )
