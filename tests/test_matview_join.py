"""Join-view IVM (sinks/matview.py IncrementalJoinAggView, r11).

The contract: a GROUP-BY aggregate over ``fact ⋈ dim_1 ⋈ … ⋈ dim_k``
refreshed from the FACT table's CDF equals a from-scratch aggregation
of the current join — with the dimensions FROZEN at their pinned
versions (a moved dimension refuses loudly), the recompute path pruning
the fact scan through the dimensions, and the cost-based fallback
rebuilding when the window's churn rivals the table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.matview import (
    DimJoin,
    IncrementalAggView,
    IncrementalJoinAggView,
    MatviewDefinitionError,
    MatviewStaleDimensionError,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable


def _fact(spark, tmp_path, n=60):
    t = TxLogTable(str(tmp_path / "fact"))
    t.append(
        spark.createDataFrame(
            [(i, i % 7, float(i * 10)) for i in range(1, n + 1)],
            "id long, supp long, amount double",
        )
    )
    t.alter_properties({"cdf.enabled": "true"})
    return t


def _dims(spark, tmp_path):
    supp = TxLogTable(str(tmp_path / "supp"))
    supp.append(
        spark.createDataFrame(
            [(s, s % 3) for s in range(7)], "s_id long, nat_id long"
        )
    )
    nat = TxLogTable(str(tmp_path / "nat"))
    nat.append(
        spark.createDataFrame(
            [(n, f"N{n}") for n in range(3)], "nat_key long, n_name string"
        )
    )
    return supp, nat


def _view(fact, supp, nat, tmp_path, aggs=None, **kw):
    return IncrementalJoinAggView(
        fact,
        str(tmp_path / "mv"),
        ["n_name"],
        aggs
        or {
            "n": ("count", "1"),
            "rev": ("sum", "amount"),
        },
        dims=[
            DimJoin(supp, on=[("supp", "s_id")], select=["nat_id"]),
            DimJoin(nat, on=[("nat_id", "nat_key")], select=["n_name"]),
        ],
        **kw,
    )


def _oracle(spark, fact, supp, nat, aggs):
    f, s, n = fact.read(spark), supp.read(spark), nat.read(spark)
    j = (
        f.join(s, f.supp == s.s_id)
        .join(n, s.nat_id == n.nat_key)
        .groupBy("n_name")
        .agg(*[e.alias(name) for name, e in aggs.items()])
    )
    return _rows(j, list(aggs))


def _rows(df, cols):
    out = {}
    for r in df.collect():
        out[r["n_name"]] = tuple(
            round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols
        )
    return out


def test_additive_join_view_tracks_fact_dml(spark, tmp_path):
    """Append + update + delete on the fact, dims untouched: two
    incremental refreshes (merge commits, never an overwrite) leave the
    view equal to a from-scratch lineitem⋈supplier⋈nation-style rollup."""
    fact_t = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)
    mv = _view(fact_t, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    aggs = {"n": F.count(F.lit(1)), "rev": F.sum("amount")}
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact_t, supp, nat, aggs
    )
    fact_t.append(
        spark.createDataFrame(
            [(100 + i, i % 7, float(1000 + i)) for i in range(5)],
            "id long, supp long, amount double",
        )
    )
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact_t, supp, nat, aggs
    )
    fact_t.update(spark, "id % 4 = 0", {"amount": "amount * 2"})
    fact_t.delete(spark, "id % 5 = 0")
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact_t, supp, nat, aggs
    )
    ops = [h["op"] for h in mv.view.history()]
    assert ops.count("merge") == 2 and "overwrite" not in ops


def test_unmatched_fact_rows_contribute_nothing(spark, tmp_path):
    """Inner-join semantics: fact rows whose supp has no supplier row
    are invisible to the view — at build AND through a refresh window
    that inserts and deletes such rows."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    before = _rows(mv.read(spark), ["n", "rev"])
    fact.append(
        spark.createDataFrame(
            [(900, 99, 1e6), (901, 98, 2e6)],  # supp 98/99: no dim row
            "id long, supp long, amount double",
        )
    )
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == before
    fact.delete(spark, "supp >= 98")
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == before


def test_fanout_dimension_consistent(spark, tmp_path):
    """A NON-unique dim key fans each fact row out k ways. That is the
    defining query's own semantics, and it stays consistent because the
    delta rows enrich against the SAME frozen snapshot: a preimage
    contributes -k exactly where its insert contributed +k."""
    fact = _fact(spark, tmp_path, n=30)
    supp = TxLogTable(str(tmp_path / "supp"))
    supp.append(
        spark.createDataFrame(
            # supplier 0 has TWO rows in different nations
            [(0, 0), (0, 1)] + [(s, s % 3) for s in range(1, 7)],
            "s_id long, nat_id long",
        )
    )
    nat = TxLogTable(str(tmp_path / "nat"))
    nat.append(
        spark.createDataFrame(
            [(n, f"N{n}") for n in range(3)], "nat_key long, n_name string"
        )
    )
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    aggs = {"n": F.count(F.lit(1)), "rev": F.sum("amount")}
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact, supp, nat, aggs
    )
    fact.update(spark, "supp = 0", {"amount": "amount + 5"})
    fact.delete(spark, "id = 7")
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact, supp, nat, aggs
    )


def test_insert_only_window_never_reads_fact(spark, tmp_path):
    """Min/max join view under an append-only fact window: the
    insert-only metadata proof keeps even the non-additive aggregates
    fold-only — no fact scan (dimension snapshots ARE read: the deltas
    must be enriched)."""
    import unittest.mock as mock

    fact = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)
    mv = _view(
        fact,
        supp,
        nat,
        tmp_path,
        aggs={"mx": ("max", "amount"), "n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    fact.append(
        spark.createDataFrame(
            [(200, 0, 9e4), (201, 3, 1.0)], "id long, supp long, amount double"
        )
    )
    boom = AssertionError("insert-only join refresh must not scan the fact")
    with mock.patch.object(fact, "read", side_effect=boom), mock.patch.object(
        fact, "_stats_candidates", side_effect=boom
    ):
        mv.refresh(spark)
    assert _rows(mv.read(spark), ["mx", "n"]) == _oracle(
        spark, fact, supp, nat, {"mx": F.max("amount"), "n": F.count(F.lit(1))}
    )


def test_recompute_prunes_fact_scan_through_dims(spark, tmp_path):
    """The join recompute path: deleting one supplier's rows affects one
    nation; the affected nation restricts the supplier rows, whose s_id
    bounds prune the supp-range-clustered fact files — scanned < total,
    and the state still matches from-scratch."""
    fact = TxLogTable(str(tmp_path / "fact"))
    fact.append(
        spark.createDataFrame(
            [(i, i % 20, float(i)) for i in range(1, 2001)],
            "id long, supp long, amount double",
        ).repartitionByRange(10, "supp")
    )
    fact.alter_properties({"cdf.enabled": "true"})
    supp = TxLogTable(str(tmp_path / "supp"))
    supp.append(
        spark.createDataFrame(
            [(s, s % 5) for s in range(20)], "s_id long, nat_id long"
        )
    )
    nat = TxLogTable(str(tmp_path / "nat"))
    nat.append(
        spark.createDataFrame(
            [(n, f"N{n}") for n in range(5)], "nat_key long, n_name string"
        )
    )
    mv = _view(
        fact,
        supp,
        nat,
        tmp_path,
        aggs={"n": ("count", "1"), "mx": ("max", "amount")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    fact.delete(spark, "supp = 3 and id > 100")
    mv.refresh(spark)
    scanned, total = mv.last_recompute_files
    assert scanned < total
    assert _rows(mv.read(spark), ["n", "mx"]) == _oracle(
        spark, fact, supp, nat, {"n": F.count(F.lit(1)), "mx": F.max("amount")}
    )


def test_recompute_vanishes_fully_deleted_group(spark, tmp_path):
    """Deleting every fact row of one nation drops that nation's view
    row on the recompute path (min/max present)."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)
    mv = _view(
        fact,
        supp,
        nat,
        tmp_path,
        aggs={"mn": ("min", "amount"), "n": ("count", "1")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    assert "N0" in _rows(mv.read(spark), ["mn", "n"])
    # nation N0 <- nat_id 0 <- suppliers {0, 3, 6}
    fact.delete(spark, "supp in (0, 3, 6)")
    mv.refresh(spark)
    got = _rows(mv.read(spark), ["mn", "n"])
    assert "N0" not in got
    assert got == _oracle(
        spark, fact, supp, nat, {"mn": F.min("amount"), "n": F.count(F.lit(1))}
    )


def test_moved_dimension_refuses_and_build_heals(spark, tmp_path):
    """Any dimension advancing past its pinned version refuses refresh
    (the delta arithmetic would mix two dimension worlds); the view is
    untouched, read() still serves the pinned-world state, and build()
    re-pins + heals."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    before = _rows(mv.read(spark), ["n", "rev"])
    fact.delete(spark, "id = 3")
    nat.append(
        spark.createDataFrame([(9, "N9")], "nat_key long, n_name string")
    )
    with pytest.raises(MatviewStaleDimensionError, match="build\\(\\)"):
        mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == before  # untouched
    mv.build(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact, supp, nat, {"n": F.count(F.lit(1)), "rev": F.sum("amount")}
    )
    fact.delete(spark, "id = 4")  # incremental works again after re-pin
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact, supp, nat, {"n": F.count(F.lit(1)), "rev": F.sum("amount")}
    )


def test_dimension_list_is_part_of_the_definition(spark, tmp_path):
    """A second instance pointing the same view path at DIFFERENT dims
    (or at a plain single-table definition) is refused."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    other = IncrementalJoinAggView(
        fact,
        str(tmp_path / "mv"),
        ["n_name"],
        {"n": ("count", "1"), "rev": ("sum", "amount")},
        dims=[
            DimJoin(supp, on=[("supp", "s_id")], select=["nat_id"]),
            DimJoin(nat, on=[("nat_id", "nat_key")]),  # select differs
        ],
    )
    with pytest.raises(MatviewDefinitionError):
        other.refresh(spark)
    flat = IncrementalAggView(
        fact, str(tmp_path / "mv"), ["supp"], {"n": ("count", "1")}
    )
    with pytest.raises(MatviewDefinitionError):
        flat.refresh(spark)


def test_bad_join_definitions_rejected(spark, tmp_path):
    fact = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)
    with pytest.raises(ValueError, match="at least one dimension"):
        IncrementalJoinAggView(
            fact, str(tmp_path / "mv"), ["supp"], {"n": ("count", "1")},
            dims=[],
        )
    with pytest.raises(ValueError, match="key pair"):
        DimJoin(supp, on=[])
    with pytest.raises(ValueError, match="identifier"):
        DimJoin(supp, on=[("supp", "s_id; drop")])
    with pytest.raises(ValueError, match="identifier"):
        DimJoin(supp, on=[("supp", "s_id")], select=["a b"])
    # collision: dim carries a column the fact already has
    bad = IncrementalJoinAggView(
        fact,
        str(tmp_path / "mv"),
        ["n_name"],
        {"n": ("count", "1")},
        dims=[
            DimJoin(supp, on=[("supp", "s_id")], select=["nat_id"]),
            DimJoin(nat, on=[("nat_id", "nat_key")]),
        ],
    )
    supp2 = TxLogTable(str(tmp_path / "supp2"))
    supp2.append(
        spark.createDataFrame(
            [(0, 0, 1.0)], "s_id long, nat_id long, amount double"
        )
    )
    clash = IncrementalJoinAggView(
        fact,
        str(tmp_path / "mv2"),
        ["nat_id"],
        {"n": ("count", "1")},
        dims=[DimJoin(supp2, on=[("supp", "s_id")])],  # carries amount
    )
    with pytest.raises(ValueError, match="collide"):
        clash.build(spark)
    # join column absent from the enriched frame
    disordered = IncrementalJoinAggView(
        fact,
        str(tmp_path / "mv3"),
        ["n_name"],
        {"n": ("count", "1")},
        dims=[DimJoin(nat, on=[("nat_id", "nat_key")])],  # nat_id not on fact
    )
    with pytest.raises(ValueError, match="not present"):
        disordered.build(spark)
    del bad


def test_churn_heavy_window_triggers_rebuild(spark, tmp_path):
    """The cost-based fallback (r11): an overwrite-everything window has
    churn bytes >= the table's bytes, so refresh() chooses build() —
    observable as an overwrite commit on the view, no merge — and the
    cursor still lands at the source head. rebuild_ratio=None pins the
    old always-incremental behavior."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)
    mv = _view(fact, supp, nat, tmp_path)  # default rebuild_ratio=1.0
    mv.build(spark)
    fact.overwrite(
        fact.read(spark).withColumn("amount", F.col("amount") + 1.0)
    )
    n_hist = len(mv.view.history())
    assert mv.refresh(spark) == fact.version()
    new_ops = [h["op"] for h in mv.view.history()[n_hist:]]
    assert "overwrite" in new_ops and "merge" not in new_ops
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact, supp, nat, {"n": F.count(F.lit(1)), "rev": F.sum("amount")}
    )
    # a later small window refreshes incrementally again
    fact.delete(spark, "id = 9")
    n_hist = len(mv.view.history())
    mv.refresh(spark)
    assert [h["op"] for h in mv.view.history()[n_hist:]].count("merge") == 1


def test_rebuild_ratio_validation_and_opt_out(spark, tmp_path):
    fact = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)
    with pytest.raises(ValueError, match="rebuild_ratio"):
        _view(fact, supp, nat, tmp_path, rebuild_ratio=0.0)
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    fact.overwrite(fact.read(spark))
    n_hist = len(mv.view.history())
    mv.refresh(spark)  # None: incremental even for a full overwrite
    new_ops = [h["op"] for h in mv.view.history()[n_hist:]]
    assert "overwrite" not in new_ops


# ------------------------------------------------------------------ #
# refresh_dimensions (r11): incremental maintenance through MOVED dims
# ------------------------------------------------------------------ #


def _dims_cdf(spark, tmp_path):
    """Dims with cdf.enabled (their own change feeds drive
    refresh_dimensions)."""
    supp, nat = _dims(spark, tmp_path)
    supp.alter_properties({"cdf.enabled": "true"})
    nat.alter_properties({"cdf.enabled": "true"})
    return supp, nat


def test_dim_update_migrates_groups(spark, tmp_path):
    """Moving a supplier to another nation: refresh() refuses with the
    refresh_dimensions hint; refresh_dimensions() recomputes exactly the
    reached groups — the losing nation shrinks, the gaining nation
    (previously ABSENT from the view) appears — and the view equals a
    from-scratch join of the current state."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims_cdf(spark, tmp_path)
    # nation 9 exists in the dim but no supplier maps to it yet
    nat.append(
        spark.createDataFrame([(9, "N9")], "nat_key long, n_name string")
    )
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    assert "N9" not in _rows(mv.read(spark), ["n", "rev"])
    supp.update(spark, "s_id = 2", {"nat_id": "9"})
    with pytest.raises(MatviewStaleDimensionError, match="refresh_dimensions"):
        mv.refresh(spark)
    mv.refresh_dimensions(spark)
    got = _rows(mv.read(spark), ["n", "rev"])
    aggs = {"n": F.count(F.lit(1)), "rev": F.sum("amount")}
    assert got == _oracle(spark, fact, supp, nat, aggs)
    assert "N9" in got
    # and the fact side refreshes normally against the new pins
    fact.delete(spark, "supp = 2 and id < 10")
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact, supp, nat, aggs
    )


def test_dim_delete_and_insert(spark, tmp_path):
    """Deleting a supplier drops its fact rows from the view; inserting
    a supplier makes previously-UNMATCHED fact rows visible (they
    contributed nothing under the inner join until the dim row
    existed)."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims_cdf(spark, tmp_path)
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    aggs = {"n": F.count(F.lit(1)), "rev": F.sum("amount")}
    supp.delete(spark, "s_id = 5")
    mv.refresh_dimensions(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact, supp, nat, aggs
    )
    # unmatched fact rows first (fact-side refresh sees them vanish into
    # the inner join), then the dim row arrives
    fact.append(
        spark.createDataFrame(
            [(900, 42, 777.0)], "id long, supp long, amount double"
        )
    )
    mv.refresh(spark)
    before = _rows(mv.read(spark), ["n", "rev"])
    supp.append(spark.createDataFrame([(42, 0)], "s_id long, nat_id long"))
    mv.refresh_dimensions(spark)
    got = _rows(mv.read(spark), ["n", "rev"])
    assert got == _oracle(spark, fact, supp, nat, aggs)
    assert got != before  # the 777.0 row became visible


def test_dim_group_key_attribute_change(spark, tmp_path):
    """Renaming a nation (the GROUP KEY value itself) vanishes the old
    group and inserts the new one — both sides of the reached-group
    union (old dims name the loser, new dims the gainer)."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims_cdf(spark, tmp_path)
    mv = _view(
        fact, supp, nat, tmp_path,
        aggs={"n": ("count", "1"), "mx": ("max", "amount")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    nat.update(spark, "nat_key = 1", {"n_name": "'N1x'"})
    mv.refresh_dimensions(spark)
    got = _rows(mv.read(spark), ["n", "mx"])
    assert "N1" not in got and "N1x" in got
    assert got == _oracle(
        spark, fact, supp, nat,
        {"n": F.count(F.lit(1)), "mx": F.max("amount")},
    )


def test_dim_refresh_reads_fact_at_cursor(spark, tmp_path):
    """Fact DML commits BEFORE the dim change, then refresh_dimensions,
    then refresh: the dim recompute must read the fact AT THE CURSOR
    (not head) so the later fact-window replay composes exactly."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims_cdf(spark, tmp_path)
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    fact.delete(spark, "id % 4 = 0")  # ahead of the cursor
    supp.update(spark, "s_id = 3", {"nat_id": "0"})
    mv.refresh_dimensions(spark)
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact, supp, nat,
        {"n": F.count(F.lit(1)), "rev": F.sum("amount")},
    )


def test_dim_refresh_crash_replay_is_exactly_once(spark, tmp_path):
    """Crash between the dim-recompute merge and the pin advance: the
    merge carries txn id matview.dims.<vector>, so the replay commits as
    a no-op and the pins then advance — never a double-apply."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims_cdf(spark, tmp_path)
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    old_pins = {
        k: v for k, v in mv.view.snapshot().properties.items()
        if k.startswith("matview.dim.")
    }
    supp.update(spark, "s_id = 2", {"nat_id": "0"})
    mv.refresh_dimensions(spark)
    after = _rows(mv.read(spark), ["n", "rev"])
    # simulate the crash: rewind the pins as if alter_properties never ran
    mv.view.alter_properties(old_pins)
    mv.refresh_dimensions(spark)  # replay
    assert _rows(mv.read(spark), ["n", "rev"]) == after
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact, supp, nat,
        {"n": F.count(F.lit(1)), "rev": F.sum("amount")},
    )


def test_dim_refresh_requires_dim_cdf(spark, tmp_path):
    """A moved dim WITHOUT cdf.enabled cannot name its changed rows:
    refresh_dimensions raises the typed window error (build() hint) and
    the view is untouched."""
    from bigdataingestion_spark.sinks.matview import (
        MatviewWindowUnreadableError,
    )

    fact = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)  # NO cdf on dims
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    before = _rows(mv.read(spark), ["n", "rev"])
    supp.update(spark, "s_id = 2", {"nat_id": "0"})
    with pytest.raises(MatviewWindowUnreadableError, match="build\\(\\)"):
        mv.refresh_dimensions(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == before
    mv.build(spark)  # heals


def test_dim_restored_raises(spark, tmp_path):
    """A RESTOREd dimension: restore COMMITS forward (the version
    advances), so the dim's CDF window contains an unreplayable restore
    commit — refresh_dimensions surfaces read_cdf's refusal as the typed
    window error with the build() hint, view untouched."""
    from bigdataingestion_spark.sinks.matview import (
        MatviewWindowUnreadableError,
    )

    fact = _fact(spark, tmp_path)
    supp, nat = _dims_cdf(spark, tmp_path)
    supp.append(spark.createDataFrame([(99, 0)], "s_id long, nat_id long"))
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    before = _rows(mv.read(spark), ["n", "rev"])
    supp.restore(supp.version() - 1)
    with pytest.raises(MatviewWindowUnreadableError, match="build\\(\\)"):
        mv.refresh_dimensions(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == before
    mv.build(spark)  # heals and re-pins past the restore


def test_dim_refresh_prunes_fact_scan(spark, tmp_path):
    """The dim recompute reuses the stats-pruned machinery: one moved
    supplier on a supp-clustered fact touches O(its span) files."""
    fact = TxLogTable(str(tmp_path / "fact"))
    fact.append(
        spark.createDataFrame(
            [(i, i % 20, float(i)) for i in range(1, 2001)],
            "id long, supp long, amount double",
        ).repartitionByRange(10, "supp")
    )
    fact.alter_properties({"cdf.enabled": "true"})
    supp = TxLogTable(str(tmp_path / "supp"))
    supp.append(
        spark.createDataFrame(
            [(s, s % 5) for s in range(20)], "s_id long, nat_id long"
        )
    )
    supp.alter_properties({"cdf.enabled": "true"})
    nat = TxLogTable(str(tmp_path / "nat"))
    nat.append(
        spark.createDataFrame(
            [(n, f"N{n}") for n in range(5)], "nat_key long, n_name string"
        )
    )
    mv = _view(fact, supp, nat, tmp_path, rebuild_ratio=None)
    mv.build(spark)
    supp.update(spark, "s_id = 7", {"nat_id": "0"})
    mv.refresh_dimensions(spark)
    scanned, total = mv.last_recompute_files
    assert scanned < total
    assert _rows(mv.read(spark), ["n", "rev"]) == _oracle(
        spark, fact, supp, nat,
        {"n": F.count(F.lit(1)), "rev": F.sum("amount")},
    )


def test_join_view_approx_distinct(spark, tmp_path):
    """approx_distinct rides the join machinery unchanged: HLL sketches
    fold under insert-only fact windows and recompute under deletes /
    dim changes, matching a from-scratch countDistinct at small
    cardinalities."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims_cdf(spark, tmp_path)
    mv = _view(
        fact, supp, nat, tmp_path,
        aggs={"n": ("count", "1"), "supps": ("approx_distinct", "supp")},
        rebuild_ratio=None,
    )
    mv.build(spark)

    def oracle():
        f, s, n = fact.read(spark), supp.read(spark), nat.read(spark)
        j = (
            f.join(s, f.supp == s.s_id)
            .join(n, s.nat_id == n.nat_key)
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("supp").alias("supps"),
            )
        )
        return _rows(j, ["n", "supps"])

    assert _rows(mv.read(spark), ["n", "supps"]) == oracle()
    fact.append(
        spark.createDataFrame(
            [(300, 1, 5.0), (301, 4, 6.0)], "id long, supp long, amount double"
        )
    )
    mv.refresh(spark)  # insert-only: sketch register-max fold
    assert _rows(mv.read(spark), ["n", "supps"]) == oracle()
    fact.delete(spark, "supp = 1")  # recompute: a supplier vanishes
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "supps"]) == oracle()
    supp.update(spark, "s_id = 2", {"nat_id": "0"})  # dim migration
    mv.refresh_dimensions(spark)
    assert _rows(mv.read(spark), ["n", "supps"]) == oracle()


def test_filtered_join_view_predicate_on_dim_column(spark, tmp_path):
    """WHERE on a join view may reference DIMENSION columns (evaluated
    post-enrichment): fact DML and a dim migration both maintain the
    filtered rollup exactly."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims_cdf(spark, tmp_path)
    mv = IncrementalJoinAggView(
        fact, str(tmp_path / "mv"), ["n_name"],
        {"n": ("count", "1"), "rev": ("sum", "amount")},
        dims=[DimJoin(supp, on=[("supp", "s_id")], select=["nat_id"]),
              DimJoin(nat, on=[("nat_id", "nat_key")], select=["n_name"])],
        rebuild_ratio=None,
        where="n_name <> 'N1' AND amount < 500",
    )
    mv.build(spark)

    def oracle():
        f, s, n = fact.read(spark), supp.read(spark), nat.read(spark)
        j = (
            f.join(s, f.supp == s.s_id)
            .join(n, s.nat_id == n.nat_key)
            .filter("n_name <> 'N1' AND amount < 500")
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("rev"))
        )
        return _rows(j, ["n", "rev"])

    assert _rows(mv.read(spark), ["n", "rev"]) == oracle()
    fact.update(spark, "id % 3 = 0", {"amount": "amount + 400"})
    fact.delete(spark, "id % 11 = 0")
    mv.refresh(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == oracle()
    # migrate a supplier INTO the excluded nation: its rows leave the
    # view; and one OUT of it: its rows (re)enter
    supp.update(spark, "s_id = 2", {"nat_id": "1"})
    supp.update(spark, "s_id = 4", {"nat_id": "2"})
    mv.refresh_dimensions(spark)
    assert _rows(mv.read(spark), ["n", "rev"]) == oracle()


def test_join_view_sql_aggregate_recomputes_everywhere(spark, tmp_path):
    """("sql", percentile) through a fact⋈supp⋈nat join view: no
    incremental form exists, so BOTH an insert-only window and a
    delete window route to the dim-pruned affected-group recompute;
    after each refresh the view equals a from-scratch join-aggregate."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)
    mv = _view(
        fact, supp, nat, tmp_path,
        aggs={
            "n": ("count", "1"),
            "med_amt": ("sql", "percentile(amount, 0.5)"),
        },
        rebuild_ratio=None,
    )
    mv.build(spark)

    def oracle():
        j = (
            fact.read(spark)
            .join(supp.read(spark), F.col("supp") == F.col("s_id"))
            .join(nat.read(spark), F.col("nat_id") == F.col("nat_key"))
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("percentile(amount, 0.5)").alias("med_amt"),
            )
        )
        return {r["n_name"]: (r["n"], r["med_amt"]) for r in j.collect()}

    fact.append(
        spark.createDataFrame(
            [(100, 0, 5.0), (101, 3, 7.0)], "id long, supp long, amount double"
        )
    )
    mv.refresh(spark)  # insert-only, still recompute
    assert mv.last_recompute_files is not None
    got = {r["n_name"]: (r["n"], r["med_amt"]) for r in mv.read(spark).collect()}
    assert got == oracle()

    fact.delete(spark, "id % 5 = 0")
    fact.update(spark, "id % 3 = 0", {"amount": "amount + 1"})
    mv.refresh(spark)
    got = {r["n_name"]: (r["n"], r["med_amt"]) for r in mv.read(spark).collect()}
    assert got == oracle()


def test_refresh_dimensions_with_sql_aggregate(spark, tmp_path):
    """A moved dimension folds into a ("sql", percentile) join view
    through refresh_dimensions: the dim-change path is recompute-based
    already, so arbitrary aggregates ride it unchanged."""
    fact = _fact(spark, tmp_path)
    supp, nat = _dims(spark, tmp_path)
    supp.alter_properties({"cdf.enabled": "true"})
    nat.alter_properties({"cdf.enabled": "true"})
    mv = _view(
        fact, supp, nat, tmp_path,
        aggs={"med_amt": ("sql", "percentile(amount, 0.5)")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    supp.update(spark, "s_id = 2", {"nat_id": "0"})  # migrate a supplier
    mv.refresh_dimensions(spark)
    mv.refresh(spark)
    want = {
        r["n_name"]: r["med_amt"]
        for r in fact.read(spark)
        .join(supp.read(spark), F.col("supp") == F.col("s_id"))
        .join(nat.read(spark), F.col("nat_id") == F.col("nat_key"))
        .groupBy("n_name")
        .agg(F.expr("percentile(amount, 0.5)").alias("med_amt"))
        .collect()
    }
    got = {r["n_name"]: r["med_amt"] for r in mv.read(spark).collect()}
    assert got == want
