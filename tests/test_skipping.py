"""Predicate-over-stats file skipping (sinks/skipping.py): the
conservative evaluator must only ever exclude files it can PROVE contain
no matching row, and must bail (keep everything) on any construct
outside its subset — plus the delete/update integration that consumes
it."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from bigdataingestion_spark.sinks.skipping import candidate_files
from bigdataingestion_spark.sinks.txlog import TxLogTable

_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("v", StringType()),
        StructField("dt", DateType()),
        StructField("ts", TimestampNTZType()),
    ]
).json()

# three files with disjoint id ranges; f2 has nulls in v; f3 all-null v
_STATS = {
    "f1": {
        "id": {"k": "num", "min": 0, "max": 9, "nulls": 0},
        "v": {"k": "str", "min": "a", "max": "m", "nulls": 0},
        "dt": {"k": "str", "min": "2024-01-01", "max": "2024-01-31", "nulls": 0},
        "ts": {
            "k": "str",
            "min": "2024-01-01T00:00:00",
            "max": "2024-01-31T23:59:59",
            "nulls": 0,
        },
    },
    "f2": {
        "id": {"k": "num", "min": 10, "max": 19, "nulls": 0},
        "v": {"k": "str", "min": "n", "max": "z", "nulls": 3},
    },
    "f3": {
        "id": {"k": "num", "min": 20, "max": 29, "nulls": 0},
        "v": {"k": None, "min": None, "max": None, "nulls": 5},
    },
}
_FILES = ["f1", "f2", "f3"]


def _cand(pred):
    return candidate_files(pred, _SCHEMA, _FILES, _STATS)


def test_range_and_equality_skips():
    assert _cand("id = 12") == ["f2"]
    assert _cand("id < 5") == ["f1"]
    assert _cand("id >= 25") == ["f3"]
    assert _cand("id > 9 AND id < 20") == ["f2"]
    assert _cand("id BETWEEN 8 AND 11") == ["f1", "f2"]
    assert _cand("id IN (3, 27)") == ["f1", "f3"]
    assert _cand("15 <= id") == ["f2", "f3"]  # mirrored literal-first form
    assert _cand("id = 99") == []


def test_string_date_timestamp_kinds():
    assert _cand("v = 'q'") == ["f2"]  # f3 all-null v rows can't equal 'q'
    assert _cand("dt > '2024-02-01'") == ["f2", "f3"]  # f1's January excluded
    assert _cand("ts >= '2024-02-01 00:00:00'") == ["f2", "f3"]
    # time-suffixed literal on a DATE column bails (cast semantics):
    assert _cand("dt = '2024-01-01 00:00:00'") == _FILES


def test_short_iso_timestamp_literals_canonicalize_before_comparing():
    """'2024-01-01' sorts lexicographically BEFORE '2024-01-01T00:00:00';
    a raw comparison would wrongly skip a file whose min is exactly
    midnight even though Spark casts the short literal to that instant.
    The literal must round-trip through fromisoformat first."""
    # f1.ts spans [2024-01-01T00:00:00, 2024-01-31T23:59:59]
    assert "f1" in _cand("ts <= '2024-01-01'")     # midnight row matches
    assert "f1" in _cand("ts = '2024-01-01'")
    assert "f1" in _cand("ts IN ('2024-01-01')")
    assert "f1" in _cand("ts BETWEEN '2023-12-01' AND '2024-01-01'")
    # minute-precision literal vs full stats string
    assert "f1" in _cand("ts <= '2024-01-01 00:00'")
    # a genuinely-before literal still skips
    assert "f1" not in _cand("ts < '2024-01-01'")
    assert "f1" not in _cand("ts <= '2023-12-31 23:59:59'")


def test_null_terms():
    assert _cand("v IS NULL") == ["f2", "f3"]  # f1 has zero nulls
    assert _cand("v IS NOT NULL") == ["f1", "f2"]  # f3 is all-null


def test_unsupported_constructs_bail_to_all_files():
    for pred in (
        "id = 1 OR id = 25",        # OR
        "NOT id = 1",               # NOT
        "id + 1 = 5",               # arithmetic
        "lower(v) = 'a'",           # function call
        "id = other_col",           # column-column
        "id = NULL",                # NULL literal
        "id == ",                   # trailing junk / parse error
        "missing_col = 5",          # unknown column -> unjudgeable term
    ):
        assert _cand(pred) == _FILES, pred


def test_partial_conjunction_still_skips():
    # a term that PARSES but cannot be judged (unknown column: no stats)
    # does not disable the judgeable one; an unPARSEABLE term (function
    # call, OR, arithmetic) bails the whole predicate — by design, since
    # partial parses cannot be trusted to preserve conjunction structure
    assert _cand("id = 12 AND missing_col = 5") == ["f2"]
    assert _cand("(id = 12) AND (v = 'p')") == ["f2"]


def test_files_without_stats_always_stay():
    files = ["f1", "nostats"]
    assert candidate_files("id = 99", _SCHEMA, files, _STATS) == ["nostats"]


def test_delete_and_update_consume_stats(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, "old") for i in range(5)], ["id", "v"]
            ).coalesce(1)
        )
    t.delete(spark, "id = 102")
    m = t.history()[-1]["op_metrics"]
    assert m["files_stat_skipped"] == 2 and m["files_rewritten"] == 1
    assert t.read(spark).count() == 14

    t.update(spark, "id BETWEEN 200 AND 204", {"v": "'upd'"})
    m = t.history()[-1]["op_metrics"]
    assert m["files_stat_skipped"] == 2 and m["files_rewritten"] == 1
    got = {r.id: r.v for r in t.read(spark).collect()}
    assert got[203] == "upd" and got[0] == "old"

    # unsupported predicate: correctness unchanged, just no skipping
    t.delete(spark, "id = 0 OR id = 204")
    m = t.history()[-1]["op_metrics"]
    assert m["files_stat_skipped"] == 0
    assert t.read(spark).count() == 12


def test_json_roundtrip_of_stats_preserves_skipping(spark, tmp_path):
    """Skip decisions must work from the stats as they come back from
    the commit log (JSON), not just from freshly-collected footers."""
    t = TxLogTable(str(tmp_path / "t"), checkpoint_interval=2)
    t.append(spark.createDataFrame([(1,)], ["id"]).coalesce(1))
    t.append(spark.createDataFrame([(100,)], ["id"]).coalesce(1))
    t.append(spark.createDataFrame([(200,)], ["id"]).coalesce(1))  # ckpt at v2
    snap = t.snapshot()
    assert len(snap.file_stats) == 3
    got = candidate_files("id > 150", json.dumps(json.loads(snap.schema_json)),
                          snap.files, snap.file_stats)
    assert len(got) == 1


# --------------------------------------------------- nested struct leaves --


def _nested_schema(mapped: bool = False) -> str:
    """id long, address struct<zip:string, geo struct<lat:long>>,
    items array<struct<sku:string>> — optionally column-mapped with
    address.zip renamed (logical 'postal', physical 'zip')."""
    from pyspark.sql.types import ArrayType

    addr_meta = (
        {
            "txlog.physicalName": "address",
            "txlog.nestedPhysical": json.dumps(
                {"postal": "zip", "geo": "geo", "geo.lat": "lat"}
            ),
        }
        if mapped
        else {}
    )
    zipname = "postal" if mapped else "zip"
    return StructType(
        [
            StructField("id", LongType()),
            StructField(
                "address",
                StructType(
                    [
                        StructField(zipname, StringType()),
                        StructField(
                            "geo",
                            StructType([StructField("lat", LongType())]),
                        ),
                    ]
                ),
                True,
                addr_meta,
            ),
            StructField(
                "items",
                ArrayType(StructType([StructField("sku", StringType())])),
            ),
        ]
    ).json()


_NESTED_STATS = {
    "f1": {
        "id": {"k": "num", "min": 0, "max": 9, "nulls": 0},
        "address.zip": {"k": "str", "min": "aaa", "max": "mmm", "nulls": 0},
        "address.geo.lat": {"k": "num", "min": 10, "max": 20, "nulls": 0},
        "items.list.element.sku": {"k": "str", "min": "a", "max": "b", "nulls": 0},
    },
    "f2": {
        "id": {"k": "num", "min": 10, "max": 19, "nulls": 0},
        "address.zip": {"k": "str", "min": "naa", "max": "zzz", "nulls": 3},
        "address.geo.lat": {"k": "num", "min": 30, "max": 40, "nulls": 0},
    },
}
_NESTED_FILES = ["f1", "f2"]


def test_nested_leaf_eq_prunes():
    out = candidate_files(
        "address.zip = 'qqq'", _nested_schema(), _NESTED_FILES, _NESTED_STATS
    )
    assert out == ["f2"]


def test_nested_deep_leaf_range_prunes():
    out = candidate_files(
        "address.geo.lat > 25", _nested_schema(), _NESTED_FILES, _NESTED_STATS
    )
    assert out == ["f2"]


def test_nested_rename_translates_both_mapping_levels():
    """Predicate uses the LOGICAL name (postal); stats key by the frozen
    PHYSICAL dotted path (address.zip)."""
    out = candidate_files(
        "address.postal = 'qqq'",
        _nested_schema(mapped=True),
        _NESTED_FILES,
        _NESTED_STATS,
    )
    assert out == ["f2"]


def test_array_element_paths_never_consulted():
    """items.sku stats live under parquet's repeated-group path and the
    walk stops at arrays — an element predicate keeps every file."""
    out = candidate_files(
        "items.sku = 'zzz'", _nested_schema(), _NESTED_FILES, _NESTED_STATS
    )
    assert out == _NESTED_FILES


def test_nested_isnull_semantics():
    # f1 has zero nulls at the leaf -> IS NULL excludes it
    out = candidate_files(
        "address.zip IS NULL", _nested_schema(), _NESTED_FILES, _NESTED_STATS
    )
    assert out == ["f2"]


def test_flat_name_shadowing_dotted_path_bails():
    """A literal flat column named 'address.zip' next to the struct path
    is ambiguous: neither interpretation may prune."""
    sch = StructType(
        [
            StructField("address.zip", StringType()),
            StructField(
                "address",
                StructType([StructField("zip", StringType())]),
            ),
        ]
    ).json()
    out = candidate_files(
        "address.zip = 'qqq'", sch, _NESTED_FILES, _NESTED_STATS
    )
    assert out == _NESTED_FILES


def test_flat_timestamp_homonym_in_non_utc_session_bails():
    """Review finding: the collision check must run against UNFILTERED
    flat names — a flat TimestampType column named 'address.zip' is
    absent from the tz-filtered types map under a non-UTC session, and
    missing the collision would consult the nested leaf's stats for a
    predicate Spark evaluates against the flat column (a wrong skip)."""
    from pyspark.sql.types import TimestampType

    sch = StructType(
        [
            StructField("address.zip", TimestampType()),
            StructField(
                "address",
                StructType([StructField("zip", StringType())]),
            ),
        ]
    ).json()
    out = candidate_files(
        "`address.zip` = 'qqq'",
        sch,
        _NESTED_FILES,
        _NESTED_STATS,
        session_tz="America/New_York",
    )
    assert out == _NESTED_FILES


def test_array_typed_struct_child_never_a_leaf_entry():
    """Review finding: array/map-typed children of a struct must not be
    emitted as judgeable 'leaves' by the schema walk."""
    from pyspark.sql.types import ArrayType

    from bigdataingestion_spark.sinks.skipping import (
        _nested_struct_entries,
    )

    sch = StructType(
        [
            StructField(
                "address",
                StructType(
                    [
                        StructField("zip", StringType()),
                        StructField("tags", ArrayType(StringType())),
                    ]
                ),
            )
        ]
    )
    entries = {lp for lp, _pp, _dt in _nested_struct_entries(sch)}
    assert entries == {"address.zip"}
