"""Round-14 features:

- ``alter(drop_aggs=...)``: the cheap half of non-additive definition
  evolution — project the state, commit the narrowed definition, NO
  source read at all; cursor survives; crash contract shared with
  rebuild/add-alter; typed refusals (unknown name, all aggregates,
  drop+re-add rename-in-disguise, top-k);
- the attach/detach protocol compression (membership rides the fold
  commit) is covered by the rewritten tests in test_round13.py and
  test_matview_union_multiprocess.py; the lease by
  test_matview_lease.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.matview import (
    _DEF_KEY,
    DimJoin,
    IncrementalAggView,
    IncrementalJoinAggView,
    IncrementalTopKView,
    IncrementalUnionAggView,
    MatviewDefinitionError,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable

SCHEMA = "id long, grp string, val double"


def _src(spark, path, rows):
    t = TxLogTable(str(path))
    t.append(spark.createDataFrame(rows, SCHEMA))
    t.alter_properties({"cdf.enabled": "true"})
    return t


def _wide(src, path):
    return IncrementalAggView(
        src,
        str(path),
        ["grp"],
        {
            "n": ("count", "1"),
            "s": ("sum", "val"),
            "hi": ("max", "val"),
            "sd": ("sql", "stddev_pop(val)"),
        },
        rebuild_ratio=None,
    )


def _read(spark, mv, cols):
    return {
        r["grp"]: tuple(
            round(r[c], 6) if isinstance(r[c], float) else r[c]
            for c in cols
        )
        for r in mv.read(spark).collect()
    }


def test_drop_aggs_no_source_read_cursor_survives(spark, tmp_path):
    src = _src(
        spark,
        tmp_path / "t",
        [(i, f"g{i % 2}", float(i)) for i in range(1, 9)],
    )
    mv = _wide(src, tmp_path / "mv")
    mv.build(spark)
    src.append(spark.createDataFrame([(20, "g0", 20.0)], SCHEMA))
    cur = mv.refresh(spark)

    # drop-only must NEVER touch the source
    real_read = src.read
    src.read = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("drop-only alter must not read the source")
    )
    try:
        got = mv.alter(spark, drop_aggs=["hi", "sd"])
    finally:
        src.read = real_read
    assert got == cur, "drop must keep the cursor, not re-anchor"
    assert set(mv.aggs) == {"n", "s"}
    assert set(mv.read(spark).columns) == {"grp", "n", "s"}
    # dropped state columns are physically gone from the stored state
    assert not any(
        c in ("_m_hi", "_q_sd") for c in mv.view.read(spark).columns
    )

    # dropping the only "sql" aggregate made the view additive: a
    # mixed window now folds (no overwrite, no recompute scan)
    src.append(spark.createDataFrame([(21, "g1", 21.0)], SCHEMA))
    src.delete(spark, "id = 2")
    mv.refresh(spark)
    ops = [h["op"] for h in mv.view.history()]
    assert ops.count("overwrite") == 1  # only alter()'s republish
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in src.read(spark)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert _read(spark, mv, ["n", "s"]) == want


def test_drop_aggs_equals_from_scratch_narrow_build(spark, tmp_path):
    src = _src(
        spark,
        tmp_path / "t",
        [(i, f"g{i % 3}", float(i * 7 % 13)) for i in range(1, 30)],
    )
    mv = _wide(src, tmp_path / "mv")
    mv.build(spark)
    src.delete(spark, "id % 5 = 0")
    mv.refresh(spark)
    mv.alter(spark, drop_aggs=["sd"])
    src.append(
        spark.createDataFrame([(100, "g0", 3.0), (101, "g2", 4.0)], SCHEMA)
    )
    mv.refresh(spark)
    narrow = IncrementalAggView(
        src,
        str(tmp_path / "mv2"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val"), "hi": ("max", "val")},
        rebuild_ratio=None,
    )
    narrow.build(spark)
    assert _read(spark, mv, ["n", "s", "hi"]) == _read(
        spark, narrow, ["n", "s", "hi"]
    )
    # the on-disk definition equals the narrow view's (modulo source)
    import json

    stored = json.loads(mv.view.snapshot().properties[_DEF_KEY])
    assert stored["aggs"] == {
        "n": ["count", "1"],
        "s": ["sum", "val"],
        "hi": ["max", "val"],
    }


def test_drop_aggs_refusals(spark, tmp_path):
    src = _src(spark, tmp_path / "t", [(1, "g0", 1.0)])
    mv = _wide(src, tmp_path / "mv")
    mv.build(spark)
    with pytest.raises(ValueError, match="not an aggregate"):
        mv.alter(spark, drop_aggs=["nope"])
    with pytest.raises(ValueError, match="not an aggregate"):
        mv.alter(spark, drop_aggs=["grp"])  # group col, not droppable
    with pytest.raises(ValueError, match="empty definition"):
        mv.alter(spark, drop_aggs=["n", "s", "hi", "sd"])
    with pytest.raises(ValueError, match="duplicate"):
        mv.alter(spark, drop_aggs=["hi", "hi"])
    # drop+re-add of one name in one call is a rename/retype in
    # disguise — refused via the pre-drop collision check
    with pytest.raises(ValueError, match="collides"):
        mv.alter(
            spark, add_aggs={"hi": ("min", "val")}, drop_aggs=["hi"]
        )
    with pytest.raises(ValueError, match="rename_aggs"):
        mv.alter(spark)
    # nothing above wrote anything
    assert set(mv.aggs) == {"n", "s", "hi", "sd"}
    mv.read(spark)


def test_alter_add_and_drop_in_one_commit(spark, tmp_path):
    src = _src(
        spark,
        tmp_path / "t",
        [(i, f"g{i % 2}", float(i)) for i in range(1, 10)],
    )
    mv = _wide(src, tmp_path / "mv")
    mv.build(spark)
    mv.alter(
        spark,
        add_aggs={"lo": ("min", "val")},
        drop_aggs=["sd", "hi"],
    )
    assert set(mv.aggs) == {"n", "s", "lo"}
    src.append(spark.createDataFrame([(50, "g1", 0.5)], SCHEMA))
    mv.refresh(spark)
    want = {
        r["grp"]: (r["n"], round(r["s"], 6), round(r["lo"], 6))
        for r in src.read(spark)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").alias("s"),
            F.min("val").alias("lo"),
        )
        .collect()
    }
    assert _read(spark, mv, ["n", "s", "lo"]) == want


def test_drop_aggs_crash_recover_rebuilds_with_narrow_definition(
    spark, tmp_path
):
    src = _src(
        spark, tmp_path / "t", [(1, "g0", 1.0), (2, "g1", 2.0)]
    )
    mv = _wide(src, tmp_path / "mv")
    mv.build(spark)
    real_alter = mv.view.alter_properties

    def dying_alter(props):
        if _DEF_KEY in props:
            raise RuntimeError("simulated crash")
        return real_alter(props)

    mv.view.alter_properties = dying_alter
    with pytest.raises(RuntimeError):
        mv.alter(spark, drop_aggs=["hi", "sd"])
    mv.view.alter_properties = real_alter
    # interrupted between the projected overwrite and the definition
    # commit: pending refuses refresh; recover() rebuilds under the
    # object's (post-drop) definition
    with pytest.raises(MatviewDefinitionError, match="pending"):
        mv.refresh(spark)
    assert set(mv.aggs) == {"n", "s"}
    mv.recover(spark)
    assert _read(spark, mv, ["n", "s"]) == {
        "g0": (1, 1.0),
        "g1": (1, 2.0),
    }


def test_drop_aggs_join_view(spark, tmp_path):
    fact = _src(
        spark,
        tmp_path / "fact",
        [(i, f"g{i % 3}", float(i)) for i in range(1, 13)],
    )
    dim = TxLogTable(str(tmp_path / "dim"))
    dim.append(
        spark.createDataFrame(
            [("g0", "north"), ("g1", "south"), ("g2", "north")],
            "grp string, region string",
        )
    )
    dim.alter_properties({"cdf.enabled": "true"})
    mv = IncrementalJoinAggView(
        fact,
        str(tmp_path / "mv"),
        ["region"],
        {
            "n": ("count", "1"),
            "s": ("sum", "val"),
            "hi": ("max", "val"),
        },
        dims=[DimJoin(dim, on=[("grp", "grp")], select=["region"])],
        rebuild_ratio=None,
    )
    mv.build(spark)
    cur = mv.alter(spark, drop_aggs=["hi"])
    assert set(mv.aggs) == {"n", "s"}
    fact.append(spark.createDataFrame([(99, "g0", 9.0)], SCHEMA))
    assert mv.refresh(spark) > cur
    want = {
        ("north",): (9, sum(float(i) for i in range(1, 13) if i % 3 != 1) + 9.0),
        ("south",): (4, sum(float(i) for i in range(1, 13) if i % 3 == 1)),
    }
    got = {
        (r["region"],): (r["n"], round(r["s"], 6))
        for r in mv.read(spark).collect()
    }
    assert got == want


def test_drop_aggs_union_view(spark, tmp_path):
    shards = [
        _src(
            spark,
            tmp_path / f"s{i}",
            [(i * 100 + j, f"g{j % 2}", float(j)) for j in range(1, 6)],
        )
        for i in range(2)
    ]
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {
            "n": ("count", "1"),
            "s": ("sum", "val"),
            "hi": ("max", "val"),
        },
        rebuild_ratio=None,
    )
    mv.build(spark)
    shards[0].append(
        spark.createDataFrame([(900, "g0", 50.0)], SCHEMA)
    )
    vec = mv.refresh(spark)
    got = mv.alter(spark, drop_aggs=["hi"])
    assert got == vec, "drop must keep the version vector"
    shards[1].delete(spark, "id % 2 = 0")
    mv.refresh(spark)
    u = None
    for t in mv.sources:
        fr = t.read(spark)
        u = fr if u is None else u.unionByName(fr)
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in u.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert _read(spark, mv, ["n", "s"]) == want


def test_rename_aggs_no_source_read_values_preserved(spark, tmp_path):
    src = _src(
        spark,
        tmp_path / "t",
        [(i, f"g{i % 2}", float(i)) for i in range(1, 9)],
    )
    mv = _wide(src, tmp_path / "mv")
    mv.build(spark)
    src.append(spark.createDataFrame([(20, "g0", 20.0)], SCHEMA))
    cur = mv.refresh(spark)
    before = _read(spark, mv, ["n", "s", "hi"])

    real_read = src.read
    src.read = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("rename-only alter must not read the source")
    )
    try:
        got = mv.alter(
            spark, rename_aggs={"s": "total_val", "hi": "max_val"}
        )
    finally:
        src.read = real_read
    assert got == cur, "rename must keep the cursor"
    assert set(mv.aggs) == {"n", "total_val", "max_val", "sd"}
    assert _read(spark, mv, ["n", "total_val", "max_val"]) == before
    # maintenance continues under the new names (recompute: sql agg)
    src.delete(spark, "id = 3")
    mv.refresh(spark)
    want = {
        r["grp"]: (r["n"], round(r["s"], 6), round(r["hi"], 6))
        for r in src.read(spark)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").alias("s"),
            F.max("val").alias("hi"),
        )
        .collect()
    }
    assert _read(spark, mv, ["n", "total_val", "max_val"]) == want


def test_rename_aggs_refusals(spark, tmp_path):
    src = _src(spark, tmp_path / "t", [(1, "g0", 1.0)])
    mv = _wide(src, tmp_path / "mv")
    mv.build(spark)
    with pytest.raises(ValueError, match="not an aggregate"):
        mv.alter(spark, rename_aggs={"nope": "x"})
    with pytest.raises(ValueError, match="collides"):
        mv.alter(spark, rename_aggs={"s": "hi"})  # existing name
    with pytest.raises(ValueError, match="collides"):
        mv.alter(spark, rename_aggs={"s": "grp"})  # group column
    with pytest.raises(ValueError, match="collides"):
        mv.alter(spark, rename_aggs={"s": "hi", "hi": "s"})  # swap
    with pytest.raises(ValueError, match="collides"):
        # rename onto a name being dropped: a change of meaning
        mv.alter(spark, drop_aggs=["hi"], rename_aggs={"s": "hi"})
    with pytest.raises(ValueError, match="drop and rename"):
        mv.alter(spark, drop_aggs=["s"], rename_aggs={"s": "x"})
    with pytest.raises(ValueError, match="identifier"):
        mv.alter(spark, rename_aggs={"s": "bad name"})
    assert set(mv.aggs) == {"n", "s", "hi", "sd"}
    mv.read(spark)


def test_alter_add_drop_rename_in_one_commit(spark, tmp_path):
    src = _src(
        spark,
        tmp_path / "t",
        [(i, f"g{i % 2}", float(i)) for i in range(1, 10)],
    )
    mv = _wide(src, tmp_path / "mv")
    mv.build(spark)
    mv.alter(
        spark,
        add_aggs={"lo": ("min", "val")},
        drop_aggs=["sd"],
        rename_aggs={"hi": "peak"},
    )
    assert set(mv.aggs) == {"n", "s", "peak", "lo"}
    src.append(spark.createDataFrame([(50, "g1", 0.5)], SCHEMA))
    mv.refresh(spark)
    want = {
        r["grp"]: (r["n"], round(r["peak"], 6), round(r["lo"], 6))
        for r in src.read(spark)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("val").alias("peak"),
            F.min("val").alias("lo"),
        )
        .collect()
    }
    assert _read(spark, mv, ["n", "peak", "lo"]) == want


def test_rename_aggs_union_view(spark, tmp_path):
    shards = [
        _src(
            spark,
            tmp_path / f"s{i}",
            [(i * 100 + j, f"g{j % 2}", float(j)) for j in range(1, 6)],
        )
        for i in range(2)
    ]
    mv = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)
    vec = mv.alter(spark, rename_aggs={"s": "total"})
    assert vec == [t.version() for t in shards]
    shards[0].append(spark.createDataFrame([(900, "g0", 9.0)], SCHEMA))
    mv.refresh(spark)
    u = None
    for t in mv.sources:
        fr = t.read(spark)
        u = fr if u is None else u.unionByName(fr)
    want = {
        r["grp"]: (r["n"], round(r["total"], 6))
        for r in u.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("total"))
        .collect()
    }
    assert _read(spark, mv, ["n", "total"]) == want


def test_drop_aggs_topk_refusal(spark, tmp_path):
    src = _src(
        spark,
        tmp_path / "t",
        [(i, f"g{i % 2}", float(i)) for i in range(1, 8)],
    )
    mv = IncrementalTopKView(
        src,
        str(tmp_path / "mv"),
        ["grp"],
        order_by="val",
        k=2,
        payload=["id"],
        rebuild_ratio=None,
    )
    mv.build(spark)
    with pytest.raises(MatviewDefinitionError, match="top-k"):
        mv.alter(spark, drop_aggs=["anything"])
