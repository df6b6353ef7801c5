"""Nested column mapping (VERDICT r7 item 4): rename-only mapping of
struct fields at any depth (through arrays and map values). The frozen
physical leaf names live in the top-level field's metadata
(txlog.nestedPhysical) — OUTSIDE the dataType, so freezing never
perturbs dataType equality — and the logical<->physical translation is a
pruning-friendly field-extraction rebuild on reads / a positional cast
on writes (JVM-side) / a zero-copy arrow view in the datasource.
Nested DROP is refused: the translations are only sound while shapes
match."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from bigdataingestion_spark.sinks.txlog import TxLogTable
from bigdataingestion_spark.sources.txlog_datasource import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp_path, name="t"):
    t = TxLogTable(str(tmp_path / name))
    t.append(
        spark.createDataFrame(
            [
                (1, Row(zip="90210", city="LA"), [Row(sku="a", qty=2)]),
                (2, Row(zip="10001", city="NY"), [Row(sku="b", qty=3)]),
            ],
            "id long, address struct<zip:string,city:string>, "
            "items array<struct<sku:string,qty:long>>",
        )
    )
    t.enable_column_mapping()
    return t


# ------------------------------------------------------------- renames --


def test_nested_rename_is_metadata_only_and_reads_back(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files_before = set(t.snapshot().files)
    t.rename_column("address.zip", "postal")
    assert set(t.snapshot().files) == files_before  # zero data movement
    got = t.read(spark)
    assert got.schema["address"].dataType.fieldNames() == ["postal", "city"]
    assert sorted((r.id, r.address.postal) for r in got.collect()) == [
        (1, "90210"),
        (2, "10001"),
    ]
    # the physical leaf name is frozen in the top-level field's metadata
    sch = StructType.fromJson(json.loads(t.snapshot().schema_json))
    nmap = json.loads(sch["address"].metadata["txlog.nestedPhysical"])
    assert nmap["postal"] == "zip"


def test_append_after_nested_rename_round_trips(spark, tmp_path):
    """New batches arrive under LOGICAL nested names; the staged parquet
    must carry the frozen PHYSICAL names so one scan spans both file
    generations."""
    t = _mk(spark, tmp_path)
    t.rename_column("address.zip", "postal")
    t.append(
        spark.createDataFrame(
            [(3, Row(postal="60601", city="CHI"), [Row(sku="c", qty=1)])],
            "id long, address struct<postal:string,city:string>, "
            "items array<struct<sku:string,qty:long>>",
        )
    )
    assert sorted(
        (r.id, r.address.postal, r.items[0].sku)
        for r in t.read(spark).collect()
    ) == [(1, "90210", "a"), (2, "10001", "b"), (3, "60601", "c")]


def test_rename_inside_array_element_struct(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("items.sku", "part_no")
    got = t.read(spark)
    el = got.schema["items"].dataType.elementType
    assert el.fieldNames() == ["part_no", "qty"]
    assert sorted((r.id, r.items[0].part_no) for r in got.collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_rename_deep_struct_and_map_value(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "deep"))
    t.append(
        spark.createDataFrame(
            [(1, Row(inner=Row(v=7)), {"k": Row(w=9)})],
            "id long, s struct<inner:struct<v:long>>, "
            "m map<string,struct<w:long>>",
        )
    )
    t.enable_column_mapping()
    t.rename_column("s.inner.v", "val")
    t.rename_column("m.w", "weight")
    r = t.read(spark).collect()[0]
    assert r.s.inner.val == 7
    assert r.m["k"].weight == 9
    # renaming the INTERMEDIATE struct re-keys its children's paths
    t.rename_column("s.inner", "core")
    r = t.read(spark).collect()[0]
    assert r.s.core.val == 7
    sch = StructType.fromJson(json.loads(t.snapshot().schema_json))
    nmap = json.loads(sch["s"].metadata["txlog.nestedPhysical"])
    assert nmap == {"core": "inner", "core.val": "v"}


def test_time_travel_sees_each_eras_nested_names(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_before = t.version()
    t.rename_column("address.zip", "postal")
    old = t.read(spark, version=v_before)
    assert old.schema["address"].dataType.fieldNames() == ["zip", "city"]
    assert sorted(r.address.zip for r in old.collect()) == ["10001", "90210"]


def test_nested_rename_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="no nested field"):
        t.rename_column("address.street", "road")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("address.zip", "city")
    with pytest.raises(ValueError, match="bare leaf"):
        t.rename_column("address.zip", "a.b")
    t2 = TxLogTable(str(tmp_path / "unmapped"))
    t2.append(spark.createDataFrame([(1, Row(a=1))], "id long, s struct<a:long>"))
    with pytest.raises(ValueError, match="enable_column_mapping"):
        t2.rename_column("s.a", "b")


def test_constraint_and_generated_guard_nested_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_constraint(spark, "zip_len", "length(address.zip) = 5")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("address.zip", "postal")
    t.drop_constraint("zip_len")
    t.rename_column("address.zip", "postal")  # now fine


# ---------------------------------------------------------------- drops --


def test_nested_drop_refused_with_overwrite_path_named(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="rename-only"):
        t.drop_column("address.city")
    # the whole struct column still drops (top-level rule unchanged)
    t.drop_column("address")
    assert t.read(spark).columns == ["id", "items"]


def test_overwrite_carries_nested_map_and_localizes_new_paths(
    spark, tmp_path
):
    """An overwrite keeps surviving nested physicals (pre-overwrite
    history stays coherent); a NEW nested field whose leaf collides with
    a renamed sibling's old physical name gets a fresh uuid, never the
    sibling's old column."""
    t = _mk(spark, tmp_path)
    t.rename_column("address.zip", "postal")
    t.overwrite(
        spark.createDataFrame(
            # 'zip' re-added NEXT TO postal (postal's physical IS 'zip')
            [(9, Row(postal="77777", city="X", zip="fresh"))],
            "id long, address struct<postal:string,city:string,zip:string>",
        )
    )
    sch = StructType.fromJson(json.loads(t.snapshot().schema_json))
    nmap = json.loads(sch["address"].metadata["txlog.nestedPhysical"])
    assert nmap["postal"] == "zip"  # carried
    assert nmap["city"] == "city"
    assert nmap["zip"].startswith("col-")  # collision -> fresh uuid
    r = t.read(spark).collect()[0]
    assert (r.address.postal, r.address.zip) == ("77777", "fresh")


def test_merge_schema_freezes_nested_identity_on_new_struct_column(
    spark, tmp_path
):
    t = _mk(spark, tmp_path)
    t.append(
        spark.createDataFrame(
            [(4, Row(zip="z", city="c"), [], Row(lat=1.0))],
            "id long, address struct<zip:string,city:string>, "
            "items array<struct<sku:string,qty:long>>, geo struct<lat:double>",
        ),
        merge_schema=True,
    )
    sch = StructType.fromJson(json.loads(t.snapshot().schema_json))
    assert sch["geo"].metadata["txlog.physicalName"].startswith("col-")
    assert json.loads(sch["geo"].metadata["txlog.nestedPhysical"]) == {
        "lat": "lat"
    }
    t.rename_column("geo.lat", "latitude")
    assert sorted(
        (r.id, r.geo.latitude if r.geo else None)
        for r in t.read(spark).collect()
    ) == [(1, None), (2, None), (4, 1.0)]


# ------------------------------------------------- DML / stats / blooms --


def test_dml_and_stat_skipping_unaffected_by_nested_rename(spark, tmp_path):
    """VERDICT done-criterion: stats consults proven unaffected — flat
    min/max skipping still prunes after a nested rename, and DML with a
    nested predicate reaches the data."""
    t = TxLogTable(str(tmp_path / "skip"))
    for g in range(6):
        t.append(
            spark.createDataFrame(
                [(g * 10 + i, Row(zip=str(g))) for i in range(5)],
                "id long, address struct<zip:string>",
            ).coalesce(1)
        )
    t.enable_column_mapping()
    t.rename_column("address.zip", "postal")
    t.delete(spark, "id = 31")  # one file holds it; flat stats prune rest
    m = t.history()[-1]["op_metrics"]
    assert m["files_stat_skipped"] >= 5, m
    assert m["files_rewritten"] == 1
    t.delete(spark, "address.postal = '0'")  # nested predicate reaches data
    assert sorted(r.id for r in t.read(spark).collect()) == sorted(
        i for i in range(60) if i % 10 < 5 and i // 10 != 0 and i != 31
    )


def test_cdf_across_nested_rename_projects_per_commit_schemas(
    spark, tmp_path
):
    t = TxLogTable(str(tmp_path / "cdf"))
    t.append(spark.createDataFrame([(1, Row(zip="a"))], "id long, s struct<zip:string>"))
    t.alter_properties({"cdf.enabled": "true"})
    t.enable_column_mapping()
    t.rename_column("s.zip", "postal")
    v = t.version()
    t.append(spark.createDataFrame([(2, Row(postal="b"))], "id long, s struct<postal:string>"))
    t.delete(spark, "id = 1")
    chg = t.read_cdf(spark, from_version=v)
    got = sorted(
        (r._change_type, r.id, r.s.postal) for r in chg.collect()
    )
    assert got == [("delete", 1, "a"), ("insert", 2, "b")]


def test_external_staging_refused_on_nested_divergence(spark, tmp_path):
    """commit_files registers files the external data plane wrote under
    LOGICAL names; once a NESTED physical name diverges, the mapped read
    would silently deliver the wrong (or no) nested column — same refusal
    as top-level divergence."""
    import os

    t = _mk(spark, tmp_path)
    t.rename_column("address.zip", "postal")
    schema = t.read(spark).schema
    staged = "part-external-nested.parquet"
    df = spark.createDataFrame(
        [(5, Row(postal="x", city="y"), [])], schema
    ).coalesce(1)
    tmp_out = str(tmp_path / "ext_out")
    df.write.parquet(tmp_out)
    part = next(
        f for f in os.listdir(tmp_out) if f.endswith(".parquet")
    )
    os.rename(os.path.join(tmp_out, part), os.path.join(t.path, staged))
    with pytest.raises(ValueError, match="diverged physical names"):
        t.commit_files([staged], schema)


# ------------------------------------------------------------ datasource --


def test_datasource_batch_read_after_nested_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("address.zip", "postal")
    t.append(
        spark.createDataFrame(
            [(3, Row(postal="60601", city="CHI"), [Row(sku="c", qty=1)])],
            "id long, address struct<postal:string,city:string>, "
            "items array<struct<sku:string,qty:long>>",
        )
    )
    got = spark.read.format("txlog").load(t.path)
    assert sorted(
        (r.id, r.address.postal, r.items[0].sku) for r in got.collect()
    ) == [(1, "90210", "a"), (2, "10001", "b"), (3, "60601", "c")]


def test_stream_spanning_nested_rename_names_rebase(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "st"))
    t.append(spark.createDataFrame([(1, Row(zip="a"))], "id long, s struct<zip:string>"))
    t.enable_column_mapping()
    t.rename_column("s.zip", "postal")
    t.append(spark.createDataFrame([(2, Row(postal="b"))], "id long, s struct<postal:string>"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="Rebase the checkpoint"):
        q = (
            spark.readStream.format("txlog")
            .load(t.path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)


def test_stream_after_nested_rename_reads_via_view(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "st2"))
    t.append(spark.createDataFrame([(1, Row(zip="a"))], "id long, s struct<zip:string>"))
    t.enable_column_mapping()
    t.rename_column("s.zip", "postal")
    rename_v = t.version()
    t.append(spark.createDataFrame([(2, Row(postal="b"))], "id long, s struct<postal:string>"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("txlog")
        .option("startingVersion", rename_v + 1)
        .load(t.path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    assert sorted((r.id, r.s.postal) for r in got.collect()) == [(2, "b")]


# ---------------------------------------------------------------- clones --


@pytest.mark.parametrize("shallow", [True, False])
def test_clone_preserves_nested_mapping(spark, tmp_path, shallow):
    t = _mk(spark, tmp_path)
    t.rename_column("address.zip", "postal")
    c = t.clone_to(spark, str(tmp_path / f"c{shallow}"), shallow=shallow)
    assert "columnMapping" in c.snapshot().reader_features
    assert sorted(
        (r.id, r.address.postal) for r in c.read(spark).collect()
    ) == [(1, "90210"), (2, "10001")]
    c.rename_column("address.postal", "pc")
    assert sorted(r.address.pc for r in c.read(spark).collect()) == [
        "10001",
        "90210",
    ]


def test_nested_mapping_preserves_nested_schema_pruning(spark, tmp_path):
    """100 TB plan contract: the logical<->physical translation is built
    from field extractions (not a struct cast), so Catalyst's nested
    schema pruning pushes THROUGH the mapping — projecting one nested
    field reads only that field's bytes from parquet, wide siblings
    stay unread."""
    import re

    t = TxLogTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, Row(zip="90210", blob="x" * 100))],
            "id long, address struct<zip:string,blob:string>",
        )
    )
    t.enable_column_mapping()
    t.rename_column("address.zip", "postal")
    plan = (
        t.read(spark)
        .select(F.col("address.postal"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and m.group(1) == "struct<address:struct<zip:string>>", plan
    # flat projections drop the struct read entirely
    plan2 = (
        t.read(spark)
        .select("id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m2 = re.search(r"ReadSchema: ([^\n]*)", plan2)
    assert m2 and m2.group(1) == "struct<id:bigint>", plan2


# ------------------------------------------------------------- property --


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_names = ["a", "x", "postal", "zz"]
_nested_op = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.sampled_from(["p", "q", "r"]),
            ),
            min_size=1,
            max_size=3,
        ),
    ),
    st.tuples(st.just("rename"), st.sampled_from(_names)),
    st.tuples(st.just("delete"), st.integers(min_value=0, max_value=9)),
)


@settings(max_examples=6, deadline=None)
@given(st.lists(_nested_op, min_size=1, max_size=6))
def test_nested_mapping_model_property(spark, tmp_path_factory, ops):
    """Model property: arbitrary interleavings of appends (always under
    the CURRENT logical nested name), nested renames (free metadata
    moves), and deletes leave the table equal to a plain-Python model,
    and every committed version time-travels to its era's rows under its
    era's nested name."""
    tmp = tmp_path_factory.mktemp("nestprop")
    t = TxLogTable(str(tmp / "t"))
    t.append(
        spark.createDataFrame(
            [(0, Row(a="seed", b="s"))],
            "id long, s struct<a:string,b:string>",
        )
    )
    t.enable_column_mapping()
    model: list[tuple[int, str, str]] = [(0, "seed", "s")]  # (id, f1, b)
    cur = "a"
    ordc = 1
    eras: list[tuple[int, str, list]] = []  # (version, era name, era rows)
    for op, payload in ops:
        if op == "append":
            rows = [
                (payload_id * 100 + ordc + i, val, "s")
                for i, (payload_id, val) in enumerate(payload)
            ]
            ordc += len(rows)
            t.append(
                spark.createDataFrame(
                    [(i, Row(**{cur: v, "b": b})) for i, v, b in rows],
                    f"id long, s struct<{cur}:string,b:string>",
                )
            )
            model.extend(rows)
        elif op == "rename":
            if payload == cur:
                continue
            t.rename_column(f"s.{cur}", payload)
            cur = payload
        else:  # delete
            pred_ids = [i for i, _v, _b in model if i % 10 == payload]
            v0 = t.version()
            t.delete(spark, f"id % 10 = {payload}")
            if not pred_ids:
                assert t.version() == v0  # no-op, no commit
                continue
            model = [(i, v, b) for i, v, b in model if i % 10 != payload]
        eras.append((t.version(), cur, sorted(model)))
        got = sorted(
            (r.id, r.s[cur], r.s.b) for r in t.read(spark).collect()
        )
        assert got == sorted(model), (op, payload, cur)
    for version, name, rows in eras:
        old = t.read(spark, version=version)
        got = sorted((r.id, r.s[name], r.s.b) for r in old.collect())
        assert got == rows, (version, name)


# ----------------------------------------------------------- nested blooms --


def _nested_bloomed(spark, tmp_path):
    """bloom.columns on a NESTED path; each file's lexicographic
    [min, max] zip range CONTAINS every probe value, so min/max stats
    prove nothing and only the bloom can exclude."""
    t = TxLogTable(str(tmp_path / "bt"))
    t.append(
        spark.createDataFrame(
            [(0, Row(zip="a0", city="x")), (1, Row(zip="z0", city="x"))],
            "id long, address struct<zip:string,city:string>",
        ).coalesce(1)
    )
    t.alter_properties({"bloom.columns": "address.zip"})
    t.append(
        spark.createDataFrame(
            [(2, Row(zip="a1", city="x")), (3, Row(zip="z1", city="x"))],
            "id long, address struct<zip:string,city:string>",
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(4, Row(zip="a2", city="x")), (5, Row(zip="z2", city="x"))],
            "id long, address struct<zip:string,city:string>",
        ).coalesce(1)
    )
    return t


def test_nested_bloom_point_delete_prunes(spark, tmp_path):
    t = _nested_bloomed(spark, tmp_path)
    t.delete(spark, "address.zip = 'a2'")
    m = t.history()[-1]["op_metrics"]
    assert m["files_bloom_skipped"] >= 1, m
    assert m["files_rewritten"] == 1
    assert sorted(r.id for r in t.read(spark).collect()) == [0, 1, 2, 3, 5]
    # absent key: every bloomed file proves disjoint -> commit-free no-op
    v = t.version()
    t.delete(spark, "address.zip = 'absent'")
    assert t.version() == v


def test_nested_bloom_survives_nested_rename(spark, tmp_path):
    """The rename re-keys bloom.columns to the new logical path; the
    sidecars — keyed by the frozen PHYSICAL dotted path — keep pruning
    for predicates under the NEW name."""
    t = _nested_bloomed(spark, tmp_path)
    t.enable_column_mapping()
    t.rename_column("address.zip", "postal")
    assert t.snapshot().properties["bloom.columns"] == "address.postal"
    t.delete(spark, "address.postal = 'z1'")
    m = t.history()[-1]["op_metrics"]
    assert m["files_bloom_skipped"] >= 1, m
    assert m["files_rewritten"] == 1
    # new appends under the new logical name still build probeable blooms
    t.append(
        spark.createDataFrame(
            [(6, Row(postal="a9", city="x")), (7, Row(postal="z9", city="x"))],
            "id long, address struct<postal:string,city:string>",
        ).coalesce(1)
    )
    v = t.version()
    t.delete(spark, "address.postal = 'nope'")
    assert t.version() == v  # all files bloom-proven disjoint


def test_nested_bloom_cross_kind_literal_proves_nothing(spark, tmp_path):
    """The literal/column kind gate covers nested paths: a numeric
    literal against the string leaf must not fake a disjointness
    proof."""
    t = TxLogTable(str(tmp_path / "ck"))
    t.append(
        spark.createDataFrame(
            [(0, Row(zip="000"))], "id long, address struct<zip:string>"
        ).coalesce(1)
    )
    t.alter_properties({"bloom.columns": "address.zip"})
    t.append(
        spark.createDataFrame(
            [(1, Row(zip="05"))], "id long, address struct<zip:string>"
        ).coalesce(1)
    )
    assert t.read(spark).filter("address.zip = 5").count() == 1
    v = t.version()
    t.delete(spark, "address.zip = 5")
    assert t.version() > v, "DML wrongly skipped by the nested bloom"
    assert sorted(r.address.zip for r in t.read(spark).collect()) == ["000"]


def test_drop_struct_column_drops_its_nested_blooms(spark, tmp_path):
    t = _nested_bloomed(spark, tmp_path)
    t.enable_column_mapping()
    t.drop_column("address")
    assert "bloom.columns" not in t.snapshot().properties


def test_stats_budget_keeps_flat_columns_and_skips_array_internals(
    spark, tmp_path
):
    """Review finding: a wide nested struct must not displace flat
    columns from the 32-column stats budget, and array-element paths
    (never consultable) must not be recorded at all."""
    from pyspark.sql import functions as F

    t = TxLogTable(str(tmp_path / "t"))
    wide = F.struct(
        *[F.lit(i).alias(f"f{i}") for i in range(40)]
    ).alias("s")
    df = spark.range(5).select(
        F.col("id"),
        wide,
        F.array(F.struct(F.lit("x").alias("sku"))).alias("items"),
    )
    t.append(df.coalesce(1))
    st = next(iter(t.snapshot().file_stats.values()))
    keys = [k for k in st if isinstance(st[k], dict)]
    assert "id" in keys, keys  # flat column kept under the budget
    assert not any("items." in k for k in keys), keys  # no array internals
    assert len(keys) <= 32
    # flat skipping still works on a wide-struct table
    t.append(
        spark.range(100, 105).select("id", wide, F.array(
            F.struct(F.lit("y").alias("sku"))).alias("items")).coalesce(1)
    )
    t.delete(spark, "id = 2")
    m = t.history()[-1]["op_metrics"]
    assert m["files_stat_skipped"] == 1
