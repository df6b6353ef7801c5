"""Regression tests for the r11 mid-round adversarial review findings.

1. The cost-based fallback must charge a row-level DML window for its
   CDF images only — NOT for copy-on-write rewrite amplification — or a
   one-row update on a large file flips refresh() into a needless full
   rebuild (review finding: _window_bytes counted add+remove for ops
   read_cdf replays from _cdf/ alone).
2. Vacuumed add/remove parquet of SYNTHESIZED replay branches
   (append/overwrite commits) must fail eagerly inside read_cdf so the
   matview wraps it in the typed MatviewWindowUnreadableError — not
   lazily inside the merge action as a raw Spark error.
3. The matview gate queries are self-evidencing: the catalog functions
   assert that their refreshes ran INCREMENTALLY (merge commits), so the
   fallback can never silently hollow out their driver evidence.
4. A join-view refresh resolves the view snapshot once (threaded through
   the hooks), not once per hook.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.matview import (
    DimJoin,
    IncrementalAggView,
    IncrementalJoinAggView,
    MatviewWindowUnreadableError,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable


def _source(spark, tmp_path, n=400):
    t = TxLogTable(str(tmp_path / "src"))
    t.append(
        spark.createDataFrame(
            [(i, f"g{i % 5}", float(i)) for i in range(1, n + 1)],
            "id long, grp string, val double",
        ).repartition(4)
    )
    t.alter_properties({"cdf.enabled": "true"})
    return t


def test_row_light_update_stays_incremental_under_default_ratio(
    spark, tmp_path
):
    """Finding 1 (window-bytes overestimate): a ONE-row update rewrites
    a whole data file (CoW), but read_cdf replays only the two tiny
    _cdf/ images — the DEFAULT fallback ratio must therefore keep the
    refresh incremental (a merge commit, never an overwrite/build)."""
    src = _source(spark, tmp_path)
    mv = IncrementalAggView(
        src, str(tmp_path / "mv"), ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
    )  # default rebuild_ratio=1.0
    mv.build(spark)
    src.update(spark, "id = 7", {"val": "val + 1"})
    n_hist = len(mv.view.history())
    mv.refresh(spark)
    new_ops = [h["op"] for h in mv.view.history()[n_hist:]]
    assert "merge" in new_ops and "overwrite" not in new_ops
    got = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in mv.read(spark).collect()
    }
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in src.read(spark)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert got == want


def test_row_light_delete_stays_incremental_under_default_ratio(
    spark, tmp_path
):
    """Same bound for deletes: removing a handful of rows rewrites
    files, but the replay cost is the delete images only."""
    src = _source(spark, tmp_path)
    mv = IncrementalAggView(
        src, str(tmp_path / "mv"), ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
    )
    mv.build(spark)
    src.delete(spark, "id in (3, 9, 27)")
    n_hist = len(mv.view.history())
    mv.refresh(spark)
    assert "merge" in [h["op"] for h in mv.view.history()[n_hist:]]


def test_vacuumed_synthesized_window_raises_typed_error(spark, tmp_path):
    """Finding 2: an OVERWRITE in the window whose replaced (pre-image)
    files were vacuumed must surface as MatviewWindowUnreadableError at
    refresh() — eagerly, via read_cdf's existence check on synthesized
    branches — never as a raw Spark failure inside the merge action."""
    src = _source(spark, tmp_path)
    mv = IncrementalAggView(
        src, str(tmp_path / "mv"), ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,  # pin incremental: the fallback would
        # legitimately heal an overwrite window by rebuilding
    )
    mv.build(spark)
    before = {r["grp"]: r["n"] for r in mv.read(spark).collect()}
    src.overwrite(src.read(spark).withColumn("val", F.col("val") + 1.0))
    src.vacuum(retention_seconds=0.0)  # reaps the replaced pre-images
    with pytest.raises(MatviewWindowUnreadableError, match="build\\(\\)"):
        mv.refresh(spark)
    assert {r["grp"]: r["n"] for r in mv.read(spark).collect()} == before
    mv.build(spark)  # heals
    got = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in mv.read(spark).collect()
    }
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in src.read(spark)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert got == want


def test_read_cdf_vacuumed_append_files_fail_eagerly(spark, tmp_path):
    """The txlog-level half of finding 2: read_cdf itself raises
    FileNotFoundError at CALL time (not action time) when a synthesized
    branch's files are gone."""
    src = _source(spark, tmp_path, n=50)
    v0 = src.version()
    src.append(
        spark.createDataFrame(
            [(1000, "g0", 1.0)], "id long, grp string, val double"
        )
    )
    v1 = src.version()
    # rewrite the appended content away, then vacuum the orphaned file
    src.overwrite(src.read(spark).filter("id < 1000"))
    src.vacuum(retention_seconds=0.0)
    with pytest.raises(FileNotFoundError, match="vacuum"):
        src.read_cdf(spark, v0, v1)


def test_matview_gate_queries_are_self_evidencing(spark):
    """Finding 3: the three matview gate queries pin rebuild_ratio=None
    and assert internally that their refreshes committed as merges —
    run them at the smoke scale to prove the asserts hold (if the
    fallback ever silently flipped them to rebuilds, the queries
    themselves would fail, not just lose evidentiary value)."""
    from bigdataingestion_spark import catalog

    sf = "/root/testdata/sf0.001"
    assert catalog.txlog_matview_additive(spark, sf).count() > 0
    assert catalog.txlog_matview_minmax(spark, sf).count() > 0
    assert catalog.txlog_matview_join(spark, sf).count() > 0


def test_join_refresh_resolves_view_snapshot_once(spark, tmp_path):
    """Finding 4: refresh() threads its snapshot through the hooks —
    the view's commit log is replayed once per refresh, not once per
    hook (O(log) driver work on long-lived views)."""
    import unittest.mock as mock

    fact = TxLogTable(str(tmp_path / "fact"))
    fact.append(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(1, 31)],
            "id long, k long, val double",
        )
    )
    fact.alter_properties({"cdf.enabled": "true"})
    dim = TxLogTable(str(tmp_path / "dim"))
    dim.append(
        spark.createDataFrame(
            [(j, f"D{j}") for j in range(3)], "d_id long, d_name string"
        )
    )
    mv = IncrementalJoinAggView(
        fact, str(tmp_path / "mv"), ["d_name"],
        {"n": ("count", "1"), "mx": ("max", "val")},
        dims=[DimJoin(dim, on=[("k", "d_id")], select=["d_name"])],
        rebuild_ratio=None,
    )
    mv.build(spark)
    fact.delete(spark, "id = 5")  # recompute path (max under delete)
    calls = []
    orig_snap = mv.view.snapshot
    orig_merge = mv.view.merge

    def counting(*a, **kw):
        calls.append("snap")
        return orig_snap(*a, **kw)

    def merge_marker(*a, **kw):
        calls.append("merge")
        return orig_merge(*a, **kw)

    with mock.patch.object(mv.view, "snapshot", side_effect=counting), \
         mock.patch.object(mv.view, "merge", side_effect=merge_marker):
        mv.refresh(spark)
    # the merge itself re-reads internally (commit-time conflict
    # handling) — the bound under test is the refresh PREAMBLE: exactly
    # ONE view-snapshot resolution before the merge is entered, i.e. no
    # per-hook re-resolution (pre-fix this was 3-4)
    pre_merge = calls[: calls.index("merge")] if "merge" in calls else calls
    assert pre_merge.count("snap") == 1, calls
    got = {r["d_name"]: (r["n"], r["mx"]) for r in mv.read(spark).collect()}
    j = (
        fact.read(spark)
        .join(dim.read(spark), F.col("k") == F.col("d_id"))
        .groupBy("d_name")
        .agg(F.count(F.lit(1)).alias("n"), F.max("val").alias("mx"))
    )
    want = {r["d_name"]: (r["n"], r["mx"]) for r in j.collect()}
    assert got == want
