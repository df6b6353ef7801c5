"""Matview source-schema-evolution contract (sinks/matview.py,
MatviewSourceSchemaError) — one rule across all four view kinds:

- a PURELY ADDITIVE source schema change (new columns the definition
  never references) refreshes normally;
- a change that drops/renames a referenced column, or retypes any
  definition input (group key, aggregate input expression, top-k order
  value, join key), raises :class:`MatviewSourceSchemaError` with the
  view UNTOUCHED — and ``build()`` re-anchors under the current schema
  when the definition still resolves there.

Mirrors the streaming source's restart contract: refuse loudly at the
boundary, heal by re-anchoring, never replay across two schema worlds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.matview import (
    DimJoin,
    IncrementalAggView,
    IncrementalJoinAggView,
    IncrementalTopKView,
    IncrementalUnionAggView,
    MatviewSourceSchemaError,
    MatviewWindowUnreadableError,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable

SCHEMA = "id long, grp string, val double"


def _rows(n0=1, n1=31):
    return [(i, f"g{i % 3}", float(i)) for i in range(n0, n1)]


def _source(spark, tmp_path, name="src"):
    t = TxLogTable(str(tmp_path / name))
    t.append(spark.createDataFrame(_rows(), SCHEMA))
    t.alter_properties({"cdf.enabled": "true"})
    return t


def _agg_view(tmp_path, src, **kw):
    return IncrementalAggView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,  # pin the incremental path under test
        **kw,
    )


def _state(mv, spark):
    return sorted(
        (r["grp"], r["n"], round(r["s"], 6))
        for r in mv.read(spark).collect()
    )


# ------------------------------------------------------ aggregate view --


def test_agg_additive_column_add_refreshes(spark, tmp_path):
    """mergeSchema column ADD in the window: the definition never reads
    the new column, so the refresh proceeds and matches the oracle."""
    src = _source(spark, tmp_path)
    mv = _agg_view(tmp_path, src)
    mv.build(spark)
    src.append(
        spark.createDataFrame(
            [(100, "g0", 5.0, "extra")],
            SCHEMA + ", note string",
        )
    )
    mv.refresh(spark)
    want = sorted(
        (r["grp"], r["n"], round(r["s"], 6))
        for r in src.read(spark)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    )
    assert _state(mv, spark) == want


def test_agg_retype_refused_view_untouched(spark, tmp_path):
    """An overwrite RETYPING the aggregate input (double → string, which
    sum() would silently implicit-cast through) is refused; the view
    and its cursor are untouched, and a second refresh refuses again
    rather than half-applying."""
    src = _source(spark, tmp_path)
    mv = _agg_view(tmp_path, src)
    mv.build(spark)
    before = _state(mv, spark)
    cursor = mv._cursor(mv.view.snapshot())
    src.overwrite(
        spark.createDataFrame(
            [(1, "g1", "2.5")], "id long, grp string, val string"
        )
    )
    for _ in range(2):
        with pytest.raises(MatviewSourceSchemaError, match="RETYPES"):
            mv.refresh(spark)
    assert _state(mv, spark) == before
    assert mv._cursor(mv.view.snapshot()) == cursor


def test_agg_drop_refused_then_build_heals(spark, tmp_path):
    """Dropping the aggregate input refuses (unresolvable); after the
    column comes back under a compatible type, build() re-anchors and
    subsequent incremental refreshes work again."""
    src = _source(spark, tmp_path)
    mv = _agg_view(tmp_path, src)
    mv.build(spark)
    src.overwrite(
        spark.createDataFrame([(1, "g1")], "id long, grp string")
    )
    with pytest.raises(MatviewSourceSchemaError, match="does not resolve"):
        mv.refresh(spark)
    # heal: the source returns to the anchored shape; build() re-anchors
    src.overwrite(spark.createDataFrame(_rows(1, 11), SCHEMA))
    mv.build(spark)
    src.append(spark.createDataFrame([(50, "g2", 7.0)], SCHEMA))
    mv.refresh(spark)
    want = sorted(
        (r["grp"], r["n"], round(r["s"], 6))
        for r in src.read(spark)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    )
    assert _state(mv, spark) == want


def test_agg_metadata_only_rename_refused(spark, tmp_path):
    """A rename_column commit contributes no CDF rows, but letting the
    cursor slide past it would strand the definition against every
    future window — the contract refuses at the boundary."""
    src = _source(spark, tmp_path)
    src.enable_column_mapping()
    mv = _agg_view(tmp_path, src)
    mv.build(spark)
    src.rename_column("val", "amount")
    with pytest.raises(MatviewSourceSchemaError):
        mv.refresh(spark)


def test_agg_rebuild_fallback_outranks_schema_refusal(spark, tmp_path):
    """With the cost fallback enabled, an overwrite big enough to trip
    rebuild_ratio rebuilds under the NEW schema instead of refusing —
    a rebuild is always schema-consistent, so no check is needed."""
    src = _source(spark, tmp_path)
    mv = IncrementalAggView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=0.5,
    )
    mv.build(spark)
    src.overwrite(
        spark.createDataFrame(
            [(i, f"g{i % 2}", str(i)) for i in range(1, 21)],
            "id long, grp string, val string",
        )
    )
    mv.refresh(spark)  # rebuild path: no refusal
    got = sorted((r["grp"], r["n"]) for r in mv.read(spark).collect())
    assert got == [("g0", 10), ("g1", 10)]


# ----------------------------------------------------------- join view --


def _join_fixture(spark, tmp_path):
    fact = TxLogTable(str(tmp_path / "fact"))
    fact.append(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(1, 31)],
            "id long, dk long, amount double",
        )
    )
    fact.alter_properties({"cdf.enabled": "true"})
    dim = TxLogTable(str(tmp_path / "dim"))
    dim.append(
        spark.createDataFrame(
            [(k, f"D{k}") for k in range(3)], "dkey long, dname string"
        )
    )
    mv = IncrementalJoinAggView(
        fact,
        str(tmp_path / "jmv"),
        ["dname"],
        {"n": ("count", "1"), "s": ("sum", "amount")},
        [DimJoin(dim, on=[("dk", "dkey")])],
        rebuild_ratio=None,
    )
    mv.build(spark)
    return fact, dim, mv


def test_join_fact_column_add_refreshes(spark, tmp_path):
    fact, dim, mv = _join_fixture(spark, tmp_path)
    fact.append(
        spark.createDataFrame(
            [(100, 1, 9.0, "x")], "id long, dk long, amount double, tag string"
        )
    )
    mv.refresh(spark)
    got = {r["dname"]: (r["n"], round(r["s"], 6)) for r in mv.read(spark).collect()}
    assert got["D1"][0] == 11  # 10 original %3==1 rows + the new one


def test_join_fact_key_retype_refused(spark, tmp_path):
    """Retyping the fact JOIN KEY (long → string) analyzes fine through
    the equi-join's implicit cast — the probe pins the pre-enrichment
    key type, so the window is refused and the view untouched."""
    fact, dim, mv = _join_fixture(spark, tmp_path)
    before = sorted((r["dname"], r["n"]) for r in mv.read(spark).collect())
    fact.overwrite(
        spark.createDataFrame(
            [(1, "1", 2.0)], "id long, dk string, amount double"
        )
    )
    with pytest.raises(MatviewSourceSchemaError, match="RETYPES"):
        mv.refresh(spark)
    assert sorted((r["dname"], r["n"]) for r in mv.read(spark).collect()) == before


def test_join_fact_agg_input_drop_refused(spark, tmp_path):
    fact, dim, mv = _join_fixture(spark, tmp_path)
    fact.overwrite(
        spark.createDataFrame([(1, 1)], "id long, dk long")
    )
    with pytest.raises(MatviewSourceSchemaError, match="does not resolve"):
        mv.refresh(spark)


# ---------------------------------------------------------- top-k view --


def _topk_fixture(spark, tmp_path):
    src = _source(spark, tmp_path)
    mv = IncrementalTopKView(
        src,
        str(tmp_path / "tmv"),
        ["grp"],
        order_by="val",
        k=3,
        payload=["id"],
        rebuild_ratio=None,
    )
    mv.build(spark)
    return src, mv


def test_topk_column_add_refreshes(spark, tmp_path):
    src, mv = _topk_fixture(spark, tmp_path)
    src.append(
        spark.createDataFrame(
            [(200, "g0", 999.0, 1)], SCHEMA + ", extra int"
        )
    )
    mv.refresh(spark)
    top_g0 = [
        r["id"]
        for r in mv.read(spark).filter("grp = 'g0'").orderBy("rank").collect()
    ]
    assert top_g0[0] == 200


def test_topk_order_value_retype_refused(spark, tmp_path):
    src, mv = _topk_fixture(spark, tmp_path)
    before = sorted(map(tuple, mv.read(spark).collect()))
    src.overwrite(
        spark.createDataFrame(
            [(1, "g1", "10")], "id long, grp string, val string"
        )
    )
    with pytest.raises(MatviewSourceSchemaError, match="RETYPES"):
        mv.refresh(spark)
    assert sorted(map(tuple, mv.read(spark).collect())) == before


def test_topk_payload_drop_refused(spark, tmp_path):
    src, mv = _topk_fixture(spark, tmp_path)
    src.overwrite(
        spark.createDataFrame([("g1", 10.0)], "grp string, val double")
    )
    with pytest.raises(MatviewSourceSchemaError, match="does not resolve"):
        mv.refresh(spark)


# ----------------------------------------------------------- union view --


def _union_fixture(spark, tmp_path):
    shards = []
    for i in range(2):
        t = TxLogTable(str(tmp_path / f"s{i}"))
        t.append(
            spark.createDataFrame(
                [
                    (j, f"g{j % 3}", float(j))
                    for j in range(1, 31)
                    if j % 2 == i
                ],
                SCHEMA,
            )
        )
        t.alter_properties({"cdf.enabled": "true"})
        shards.append(t)
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "umv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    return shards, mv


def test_union_shard_column_add_refreshes(spark, tmp_path):
    shards, mv = _union_fixture(spark, tmp_path)
    shards[0].append(
        spark.createDataFrame(
            [(100, "g2", 4.0, "x")], SCHEMA + ", note string"
        )
    )
    shards[1].append(spark.createDataFrame([(101, "g2", 6.0)], SCHEMA))
    mv.refresh(spark)
    got = {r["grp"]: (r["n"], round(r["s"], 6)) for r in mv.read(spark).collect()}
    full = None
    for t in shards:
        fr = t.read(spark).select("id", "grp", "val")
        full = fr if full is None else full.unionByName(fr)
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in full.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert got == want


def test_union_shard_drift_refused_view_untouched(spark, tmp_path):
    """One shard's window retypes the aggregate input while the other
    stays compatible: the refusal names the drifting shard and the view
    reflects NEITHER window (version vector unmoved) — drift beyond
    unionByName's reach (same names, diverged types) is caught."""
    shards, mv = _union_fixture(spark, tmp_path)
    before = sorted((r["grp"], r["n"]) for r in mv.read(spark).collect())
    vec_before = mv._cursor_vec(mv.view.snapshot())
    shards[1].append(spark.createDataFrame([(101, "g2", 6.0)], SCHEMA))
    shards[0].overwrite(
        spark.createDataFrame(
            [(2, "g2", "8")], "id long, grp string, val string"
        )
    )
    with pytest.raises(MatviewSourceSchemaError, match="RETYPES"):
        mv.refresh(spark)
    assert sorted((r["grp"], r["n"]) for r in mv.read(spark).collect()) == before
    assert mv._cursor_vec(mv.view.snapshot()) == vec_before


def test_union_refusal_is_window_unreadable_subtype(spark, tmp_path):
    """API contract: callers already catching MatviewWindowUnreadableError
    (the generic rebuild-to-heal signal) catch the schema refusal too."""
    assert issubclass(MatviewSourceSchemaError, MatviewWindowUnreadableError)


# ------------------------------------------- dim drift (join view) --


def test_join_dim_column_add_folds_incrementally(spark, tmp_path):
    """A moved dimension that only ADDED a column (plus row changes)
    folds incrementally: the definition's shape is unchanged, so the
    dim-drift check passes and refresh_dimensions proceeds."""
    fact, dim, mv = _join_fixture(spark, tmp_path)
    dim.alter_properties({"cdf.enabled": "true"})
    dim.append(
        spark.createDataFrame(
            [(9, "D9", "note")], "dkey long, dname string, extra string"
        )
    )
    mv.refresh_dimensions(spark)
    got = {r["dname"]: r["n"] for r in mv.read(spark).collect()}
    assert "D9" not in got  # no fact rows reach the new dim key
    assert sum(got.values()) == 30


def test_join_dim_carried_column_retype_refused(spark, tmp_path):
    """The dim mirror of the window check: an overwrite retyping the
    CARRIED group column (string → int) refuses with the typed error
    and the view untouched — a silent fold would corrupt the state
    merge on the retyped key."""
    fact, dim, mv = _join_fixture(spark, tmp_path)
    dim.alter_properties({"cdf.enabled": "true"})
    before = sorted((r["dname"], r["n"]) for r in mv.read(spark).collect())
    dim.overwrite(
        spark.createDataFrame(
            [(k, k % 2) for k in range(3)], "dkey long, dname int"
        )
    )
    with pytest.raises(MatviewSourceSchemaError, match="RETYPE"):
        mv.refresh_dimensions(spark)
    assert sorted((r["dname"], r["n"]) for r in mv.read(spark).collect()) == before


def test_join_dim_carried_column_drop_refused(spark, tmp_path):
    fact, dim, mv = _join_fixture(spark, tmp_path)
    dim.alter_properties({"cdf.enabled": "true"})
    dim.overwrite(spark.createDataFrame([(0,)], "dkey long"))
    with pytest.raises(MatviewSourceSchemaError, match="does not resolve"):
        mv.refresh_dimensions(spark)


def test_schema_check_free_on_unchanged_windows(spark, tmp_path, monkeypatch):
    """Perf contract: a window whose commits all carry the cursor
    schema (the overwhelmingly common case) must never pay a schema
    analysis — the check short-circuits on the serialized-schema string
    before building any probe frame."""
    src = _source(spark, tmp_path)
    mv = _agg_view(tmp_path, src)
    mv.build(spark)

    def boom(*a, **kw):
        raise AssertionError("schema analysis ran on an unchanged window")

    monkeypatch.setattr(IncrementalAggView, "_definition_shape", boom)
    src.append(spark.createDataFrame([(100, "g0", 5.0)], SCHEMA))
    src.delete(spark, "id = 2")
    mv.refresh(spark)  # would raise if any analysis happened
