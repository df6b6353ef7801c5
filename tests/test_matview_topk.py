"""Incremental top-k materialized views (sinks/matview.py).

The contract under test: after any DML sequence on the source,
``refresh()`` leaves the view EQUAL to a from-scratch per-group top-k of
the current source snapshot — by bounded re-rank of (stored rows ∪
inserts) under insert-only windows (source never read), by stats-pruned
affected-group recompute when the window deletes or updates — with the
inherited cursor/exactly-once/cost-fallback machinery intact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataingestion_spark.sinks.matview import (
    IncrementalTopKView,
    MatviewDefinitionError,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable

SCHEMA = "id long, grp string, score double"


def _source(spark, tmp_path, rows=None):
    t = TxLogTable(str(tmp_path / "src"))
    rows = rows if rows is not None else [
        (i, f"g{i % 3}", float((i * 7) % 50)) for i in range(1, 31)
    ]
    t.append(spark.createDataFrame(rows, SCHEMA))
    t.alter_properties({"cdf.enabled": "true"})
    return t


def _view(spark, tmp_path, src, k=3, **kw):
    return IncrementalTopKView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        order_by="score",
        k=k,
        payload=["id"],
        order_name="score",
        **kw,
    )


def _rows(df):
    return sorted(
        (r["grp"], r["rank"], round(r["score"], 6), r["id"])
        for r in df.collect()
    )


def _oracle(spark, src, k=3, where=None, descending=True):
    df = src.read(spark)
    if where:
        df = df.filter(where)
    ordc = F.col("score").desc() if descending else F.col("score").asc()
    w = Window.partitionBy("grp").orderBy(ordc, F.col("id").asc())
    top = (
        df.filter(F.col("score").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return sorted(
        (r["grp"], r["rank"], round(r["score"], 6), r["id"])
        for r in top.collect()
    )


def _ops(mv):
    return [h["op"] for h in mv.view.history()]


def test_build_matches_from_scratch_topk(spark, tmp_path):
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src)
    mv.build(spark)
    assert _rows(mv.read(spark)) == _oracle(spark, src)


def test_insert_only_fold_never_reads_source(spark, tmp_path):
    """Appends only: the refresh re-ranks stored ∪ inserts and commits
    one merge; the recompute path (the only source reader) never runs."""
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src, rebuild_ratio=None)
    mv.build(spark)
    src.append(
        spark.createDataFrame(
            [(100, "g0", 999.0), (101, "g1", 0.5), (102, "g3", 1.0)],
            SCHEMA,
        )
    )
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _oracle(spark, src)
    assert _ops(mv).count("merge") == 1
    assert mv.last_recompute_files is None  # recompute path never ran
    # 999 entered g0's board at rank 1; g3 is a brand-new group
    got = {(g, r): i for g, r, _, i in _rows(mv.read(spark))}
    assert got[("g0", 1)] == 100
    assert ("g3", 1) in got


def test_insert_below_horizon_changes_nothing(spark, tmp_path):
    """An insert worse than every stored rank leaves the board
    unchanged — and the merge rewrites no leaderboard rows (the
    unchanged-rank anti-join drops them)."""
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src, rebuild_ratio=None)
    mv.build(spark)
    before = _rows(mv.read(spark))
    src.append(spark.createDataFrame([(200, "g0", -1.0)], SCHEMA))
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == before
    # content-invariant window: the unchanged-rank anti-join leaves the
    # merge source empty, so NO leaderboard file is rewritten (an empty
    # merge doesn't even commit)
    merges = [h for h in mv.view.history() if h["op"] == "merge"]
    assert all(
        not h.get("add") and not h.get("remove") for h in merges
    )


def test_delete_resurfaces_displaced_row(spark, tmp_path):
    """Deleting a stored top row must pull the row it displaced (below
    the stored horizon) back into the board — only a recompute can."""
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src, rebuild_ratio=None)
    mv.build(spark)
    top_id = next(i for g, r, s, i in _rows(mv.read(spark)) if g == "g0" and r == 1)
    src.delete(spark, f"id = {top_id}")
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _oracle(spark, src)
    assert mv.last_recompute_files is not None  # recompute path ran


def test_update_demoting_and_promoting_rows(spark, tmp_path):
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src, rebuild_ratio=None)
    mv.build(spark)
    src.update(spark, "id % 5 = 0", {"score": "score * 0.1"})
    src.update(spark, "id % 7 = 0", {"score": "score * 10"})
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _oracle(spark, src)


def test_group_vanish_and_shrink_below_k(spark, tmp_path):
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src, rebuild_ratio=None)
    mv.build(spark)
    src.delete(spark, "grp = 'g2'")          # whole group vanishes
    src.delete(spark, "grp = 'g1' AND id > 7")  # shrink under k
    mv.refresh(spark)
    got = _rows(mv.read(spark))
    assert got == _oracle(spark, src)
    assert not any(g == "g2" for g, _, _, _ in got)
    g1 = [r for g, r, _, _ in got if g == "g1"]
    assert g1 == list(range(1, len(g1) + 1))  # contiguous ranks from 1


def test_multiple_windows_interleaved(spark, tmp_path):
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src, rebuild_ratio=None)
    mv.build(spark)
    src.append(
        spark.createDataFrame([(100, "g0", 48.5), (101, "g4", 3.0)], SCHEMA)
    )
    mv.refresh(spark)
    src.update(spark, "grp = 'g4'", {"score": "score + 100"})
    src.delete(spark, "id % 11 = 0")
    mv.refresh(spark)
    src.append(spark.createDataFrame([(102, "g4", 50.0)], SCHEMA))
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _oracle(spark, src)


def test_ascending_order(spark, tmp_path):
    """descending=False keeps the k SMALLEST."""
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src, descending=False, rebuild_ratio=None)
    mv.build(spark)
    src.append(spark.createDataFrame([(100, "g0", -5.0)], SCHEMA))
    mv.refresh(spark)
    src.delete(spark, "id = 100")
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _oracle(spark, src, descending=False)


def test_null_order_values_excluded(spark, tmp_path):
    rows = [(1, "g0", 5.0), (2, "g0", None), (3, "g0", 1.0)]
    src = _source(spark, tmp_path, rows)
    mv = _view(spark, tmp_path, src, k=2, rebuild_ratio=None)
    mv.build(spark)
    assert [i for _, _, _, i in _rows(mv.read(spark))] == [1, 3]
    # a NULL-scored insert never enters; a real one does
    src.append(spark.createDataFrame([(4, "g0", None), (5, "g0", 2.0)], SCHEMA))
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _oracle(spark, src, k=2)


def test_where_filter_boundary_crossing(spark, tmp_path):
    """Filtered view: an update moving rows across the WHERE boundary
    adds/removes them from the board exactly as a filtered top-k query
    over the final source would."""
    src = _source(spark, tmp_path)
    mv = IncrementalTopKView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        order_by="score",
        k=3,
        payload=["id"],
        order_name="score",
        where="score < 40",
        rebuild_ratio=None,
    )
    mv.build(spark)
    src.update(spark, "id % 4 = 0", {"score": "score + 45"})  # some cross out
    src.update(spark, "id % 9 = 0", {"score": "score - 45"})  # some cross in
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _oracle(spark, src, where="score < 40")


def test_tie_break_total_order_fold_equals_rebuild(spark, tmp_path):
    """All-equal scores: payload tie-break makes the order total, so the
    incremental fold and a from-scratch build keep the SAME rows."""
    rows = [(i, "g0", 1.0) for i in range(1, 10)]
    src = _source(spark, tmp_path, rows)
    mv = _view(spark, tmp_path, src, rebuild_ratio=None)
    mv.build(spark)
    src.append(spark.createDataFrame([(0, "g0", 1.0)], SCHEMA))
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _oracle(spark, src)
    assert [i for _, _, _, i in _rows(mv.read(spark))] == [0, 1, 2]


def test_cost_fallback_rebuilds_on_churn_heavy_window(spark, tmp_path):
    """Default rebuild_ratio: an overwrite-everything window replays at
    least the source's size, so refresh() falls back to build()."""
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src)  # rebuild_ratio=1.0 default
    mv.build(spark)
    src.overwrite(
        src.read(spark).withColumn("score", F.col("score") + 1.0)
    )
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _oracle(spark, src)
    assert "overwrite" in _ops(mv)  # build path, not merge


def test_cursor_survives_fallback_and_keeps_refreshing(spark, tmp_path):
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src)
    mv.build(spark)
    src.overwrite(src.read(spark).filter("id <= 20"))
    mv.refresh(spark)  # falls back to build
    src.append(spark.createDataFrame([(100, "g1", 77.0)], SCHEMA))
    mv.refresh(spark)  # incremental again
    assert _rows(mv.read(spark)) == _oracle(spark, src)


def test_refresh_noop_when_source_unchanged(spark, tmp_path):
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src, rebuild_ratio=None)
    v = mv.build(spark)
    assert mv.refresh(spark) == v
    assert _ops(mv).count("merge") == 0


def test_null_group_key_refused(spark, tmp_path):
    rows = [(1, None, 5.0), (2, "g0", 1.0)]
    src = _source(spark, tmp_path, rows)
    mv = _view(spark, tmp_path, src)
    with pytest.raises(ValueError, match="NULL group key"):
        mv.build(spark)


def test_definition_mismatch_refuses(spark, tmp_path):
    src = _source(spark, tmp_path)
    mv = _view(spark, tmp_path, src, k=3)
    mv.build(spark)
    other = _view(spark, tmp_path, src, k=5)
    with pytest.raises(MatviewDefinitionError):
        other.refresh(spark)
    with pytest.raises(MatviewDefinitionError):
        other.read(spark)


def test_bad_definitions_rejected(spark, tmp_path):
    src = _source(spark, tmp_path)
    mk = lambda **kw: IncrementalTopKView(
        src, str(tmp_path / "mv"),
        kw.pop("group_cols", ["grp"]),
        order_by=kw.pop("order_by", "score"),
        k=kw.pop("k", 3),
        payload=kw.pop("payload", ["id"]),
        **kw,
    )
    with pytest.raises(ValueError, match="positive int"):
        mk(k=0)
    with pytest.raises(ValueError, match="at least one column"):
        mk(payload=[])
    with pytest.raises(ValueError, match="collides with a group"):
        mk(payload=["grp"])
    with pytest.raises(ValueError, match="_mv_"):
        mk(payload=["_mv_x"])
    with pytest.raises(ValueError, match="plain SQL identifier"):
        mk(payload=["a b"])
    with pytest.raises(ValueError, match="repeat"):
        mk(payload=["id", "ID"])
    with pytest.raises(ValueError, match="collides"):
        mk(order_name="rank")
    with pytest.raises(ValueError, match="collides"):
        mk(order_name="id")
    with pytest.raises(ValueError, match="SQL expression"):
        mk(order_by="  ")


def test_order_by_expression_not_just_column(spark, tmp_path):
    """order_by is an arbitrary SQL expression over source columns."""
    src = _source(spark, tmp_path)
    mv = IncrementalTopKView(
        src, str(tmp_path / "mv"), ["grp"],
        order_by="score * 2 + id",
        k=2, payload=["id", "score"], rebuild_ratio=None,
    )
    mv.build(spark)
    src.append(spark.createDataFrame([(500, "g1", 20.0)], SCHEMA))
    mv.refresh(spark)
    src.delete(spark, "id = 500")
    mv.refresh(spark)
    w = Window.partitionBy("grp").orderBy(
        (F.col("score") * 2 + F.col("id")).desc(),
        F.col("id").asc(), F.col("score").asc(),
    )
    want = sorted(
        (r["grp"], r["rank"], r["id"])
        for r in src.read(spark)
        .withColumn("rank", F.row_number().over(w))
        .filter("rank <= 2").collect()
    )
    got = sorted(
        (r["grp"], r["rank"], r["id"]) for r in mv.read(spark).collect()
    )
    assert got == want


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
def test_random_dml_matches_from_scratch_topk(spark, tmp_path, data):
    """Random interleavings of appends (including NULL scores and new
    groups), slice updates, slice deletes, and whole-group deletes,
    refreshed at random batch boundaries, must keep the view equal to a
    from-scratch ranked window over the live source — across the
    insert-only fold, the affected-group recompute, rank shrink, and
    group vanish."""
    base = tmp_path / f"ex{next(_uniq)}"
    src = TxLogTable(str(base / "src"))
    src.append(
        spark.createDataFrame(
            [(i, f"g{i % 4}", float((i * 13) % 37)) for i in range(1, 25)],
            SCHEMA,
        )
    )
    src.alter_properties({"cdf.enabled": "true"})
    mv = IncrementalTopKView(
        src,
        str(base / "mv"),
        ["grp"],
        order_by="score",
        k=3,
        payload=["id"],
        order_name="score",
        rebuild_ratio=None,  # pin the incremental machinery under test
    )
    mv.build(spark)
    next_id = 1000
    n_ops = data.draw(st.integers(2, 5), label="n_ops")
    for step in range(n_ops):
        op = data.draw(st.integers(0, 3), label=f"op{step}")
        if op == 0:  # append: new/old group, real/NULL/tied score
            g = data.draw(st.integers(0, 5), label=f"g{step}")
            s = data.draw(
                st.sampled_from([None, 0.0, 13.0, 99.0]), label=f"s{step}"
            )
            src.append(
                spark.createDataFrame(
                    [(next_id, f"g{g}", s)], SCHEMA
                )
            )
            next_id += 1
        elif op == 1:  # update a slice (demote/promote leaders)
            m = data.draw(st.integers(2, 5), label=f"m{step}")
            d = data.draw(st.sampled_from([-20, 15]), label=f"dv{step}")
            src.update(spark, f"id % {m} = 0", {"score": f"score + {d}"})
        elif op == 2:  # delete a slice (resurface displaced rows)
            m = data.draw(st.integers(2, 6), label=f"d{step}")
            src.delete(spark, f"id % {m} = 1")
        else:  # delete a whole group
            g = data.draw(st.integers(0, 4), label=f"dg{step}")
            src.delete(spark, f"grp = 'g{g}'")
        if data.draw(st.booleans(), label=f"maint{step}"):
            mv.refresh(spark)
            assert _rows(mv.read(spark)) == _oracle(spark, src)
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _oracle(spark, src)


def test_view_side_prune_after_zorder_compact(spark, tmp_path):
    """The refresh's stored-rows read is stats-pruned by the VIEW's own
    per-file group bounds: after clustering the view with
    compact(zorder_by=<group>), a one-group window reads a strict
    subset of the view's files (the build's hash-shuffled layout proves
    nothing). Numeric group key — zorder_key quantile-buckets numerics."""
    schema = "id long, g long, score double"
    src = TxLogTable(str(tmp_path / "src"))
    src.append(
        spark.createDataFrame(
            [(i, i % 40, float(i)) for i in range(1, 401)], schema
        )
    )
    src.alter_properties({"cdf.enabled": "true"})
    mv = IncrementalTopKView(
        src, str(tmp_path / "mv"), ["g"],
        order_by="score", k=3, payload=["id"],
        order_name="score", rebuild_ratio=None,
    )
    mv.build(spark)
    # cluster the leaderboard by group and force a multi-file layout
    mv.view.compact(spark, target_file_bytes=2048, zorder_by=["g"])
    n_files = len(mv.view.snapshot().files)
    assert n_files > 1, "need a multi-file view for the prune to show"
    src.append(spark.createDataFrame([(500, 5, 999.0)], schema))
    mv.refresh(spark)  # insert-only fold, one affected group
    scanned, total = mv.last_view_files
    assert total == n_files
    assert scanned < total, (scanned, total)
    want = sorted(
        (r["g"], r["rank"], r["id"])
        for r in src.read(spark)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("g").orderBy(
                    F.col("score").desc(), F.col("id").asc()
                )
            ),
        )
        .filter("rank <= 3")
        .collect()
    )
    got = sorted(
        (r["g"], r["rank"], r["id"]) for r in mv.read(spark).collect()
    )
    assert got == want


def test_rank_column_collisions_refused(spark, tmp_path):
    """read() emits a 'rank' output column; a payload or group column of
    that name would produce ambiguous duplicates."""
    src = _source(spark, tmp_path)
    with pytest.raises(ValueError, match="rank output column"):
        IncrementalTopKView(
            src, str(tmp_path / "mv"), ["grp"],
            order_by="score", k=3, payload=["rank"],
        )
    with pytest.raises(ValueError, match="rank output column"):
        IncrementalTopKView(
            src, str(tmp_path / "mv"), ["rank"],
            order_by="score", k=3, payload=["id"],
        )


def test_underscore_group_columns_refused(spark, tmp_path):
    """A group key in the views' internal underscore namespace
    (_mv_rank would be OVERWRITTEN by the ranker) is refused at
    construction for every view kind."""
    src = _source(spark, tmp_path)
    with pytest.raises(ValueError, match="underscore-prefixed"):
        IncrementalTopKView(
            src, str(tmp_path / "mv"), ["_mv_rank"],
            order_by="score", k=3, payload=["id"],
        )
    from bigdataingestion_spark.sinks.matview import IncrementalAggView

    with pytest.raises(ValueError, match="underscore-prefixed"):
        IncrementalAggView(
            src, str(tmp_path / "mv"), ["_mv_n"], {"n": ("count", "1")}
        )
