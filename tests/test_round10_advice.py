"""Round-10 advisory regressions (ADVICE r9) — all four findings target
the identity-column subsystem:

1. (high) rename_column must re-key ``identity.hwm.<old>`` to the new
   name; without it a renamed identity column's allocator restarts from
   ``start`` and silently issues duplicate ids.
2. (low) overwrite's metadata carry must refuse to attach the identity
   contract to a non-BIGINT replacement column (it would bypass
   add_identity_column's LongType check).
3. (low) UPDATE SET and MERGE must agree on identity assignability:
   GENERATED ALWAYS is never assignable, BY DEFAULT is — with the
   high-water mark advanced past assigned values in the same commit.
4. (low) blind-append reconcilability on identity tables: delta-free
   ops reconcile over a concurrent mark advance, and the opt-in
   ``identity.allocation.mode=reserve`` restores full append
   concurrency (range reservation commit + property-delta-free data
   commit) — proven under real cross-process writers with NO caller
   retry loop.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from bigdataingestion_spark.sinks.txlog import (
    ConcurrentWriteError,
    IdentityColumnViolationError,
    TxLogTable,
)


def _ids(t, spark, col="id"):
    return sorted(r[col] for r in t.read(spark).select(col).collect())


# ------------------------------------------------ 1. rename hwm rekey --


def test_rename_identity_column_rekeys_high_water_mark(spark, tmp_path):
    """ADVICE r9 (high) repro: rename an identity column under column
    mapping, then append — allocation must CONTINUE from the carried
    mark (ids stay unique), not restart from 1."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    t.append(spark.createDataFrame([("a",), ("b",), ("c",)], ["v"]))
    t.enable_column_mapping()
    t.rename_column("id", "row_id")
    props = t.snapshot().properties
    assert props.get("identity.hwm.row_id") == "3"
    assert "identity.hwm.id" not in props
    t.append(spark.createDataFrame([("d",), ("e",)], ["v"]))
    assert _ids(t, spark, "row_id") == [1, 2, 3, 4, 5]
    assert t.snapshot().properties["identity.hwm.row_id"] == "5"


def test_rename_identity_column_also_rekeys_blooms(spark, tmp_path):
    """The rename rekey covers BOTH property families in one commit."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    t.alter_properties({"bloom.columns": "id,v"})
    t.append(spark.createDataFrame([("a",)], ["v"]))
    t.enable_column_mapping()
    t.rename_column("id", "rid")
    props = t.snapshot().properties
    assert props["bloom.columns"] == "rid,v"
    assert props.get("identity.hwm.rid") == "1"
    assert "identity.hwm.id" not in props


# --------------------------------------- 2. overwrite type-carry guard --


def test_overwrite_refuses_non_bigint_identity_replacement(spark, tmp_path):
    """ADVICE r9 (low) repro: overwriting a BY DEFAULT identity table
    with a same-named STRING column must raise instead of committing
    identity metadata on a non-long column."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id", always=False)
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    bad = spark.createDataFrame([("5", "x"), ("6", "y")], ["id", "v"])
    with pytest.raises(IdentityColumnViolationError, match="BIGINT"):
        t.overwrite(bad)
    # the table is untouched: same rows, same mark
    assert _ids(t, spark) == [1, 2]
    assert t.snapshot().properties["identity.hwm.id"] == "2"


def test_overwrite_carries_identity_on_long_replacement(spark, tmp_path):
    """Control: a LongType overwrite still carries the contract and the
    mark keeps advancing across it (TRUNCATE/overwrite never resets)."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id", always=False)
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    t.overwrite(
        spark.createDataFrame([(None, "z")], "id bigint, v string")
    )
    assert _ids(t, spark) == [3]  # allocation continued past the mark


# ----------------------------- 3. UPDATE vs MERGE identity consistency --


def test_update_refuses_generated_always_identity(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    t.append(spark.createDataFrame([("a",)], ["v"]))
    with pytest.raises(IdentityColumnViolationError, match="ALWAYS"):
        t.update(spark, "v = 'a'", {"id": "id + 100"})


def test_update_by_default_identity_advances_mark(spark, tmp_path):
    """ADVICE r9 (low): BY DEFAULT identity is assignable in UPDATE (the
    contract append and merge already honor for supplied values), and
    the mark advances past the assigned extreme in the SAME commit so a
    later append cannot re-issue those ids."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id", always=False)
    t.append(spark.createDataFrame([("a",), ("b",), ("c",)], ["v"]))
    t.update(spark, "v = 'b'", {"id": "id + 100"})
    assert _ids(t, spark) == [1, 3, 102]
    assert t.snapshot().properties["identity.hwm.id"] == "102"
    t.append(spark.createDataFrame([("d",)], ["v"]))
    ids = _ids(t, spark)
    assert len(ids) == len(set(ids)) == 4
    assert max(ids) == 103  # allocated ABOVE the assigned value


def test_update_by_default_below_mark_keeps_mark(spark, tmp_path):
    """Assigning a value BELOW the mark must not rewind it."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id", always=False)
    t.append(spark.createDataFrame([("a",), ("b",), ("c",)], ["v"]))
    t.update(spark, "v = 'c'", {"id": "-7"})
    assert t.snapshot().properties["identity.hwm.id"] == "3"


# --------------------------- 4. reconcile over a concurrent mark bump --


def test_delta_free_op_reconciles_over_identity_hwm_advance(
    spark, tmp_path
):
    """A concurrent identity append's only metadata effect is an
    advanced ``identity.hwm.*``; an op carrying NO property delta of
    its own must reconcile over it (before the fix: hard 'table
    properties changed concurrently' conflict, so ANY DML racing an
    identity append lost its full staging)."""
    import json

    from pyspark.sql.types import StructType

    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    t.append(spark.createDataFrame([("a",)], ["v"]))
    base = t.snapshot()
    t.append(spark.createDataFrame([("b",)], ["v"]))  # winner: bumps hwm
    schema = StructType.fromJson(json.loads(base.schema_json))
    v = t._commit_reconciled([], [], schema, "delete", None, base)
    assert v == t.snapshot().version
    assert t.snapshot().properties["identity.hwm.id"] == "2"  # bump kept


def test_own_property_delta_still_conflicts_on_hwm_drift(spark, tmp_path):
    """Legacy-mode safety is untouched: an op carrying its OWN property
    delta (an allocation racing another allocation) must still hard-
    conflict — that rule is what makes duplicate ranges impossible."""
    import json

    from pyspark.sql.types import StructType

    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    t.append(spark.createDataFrame([("a",)], ["v"]))
    base = t.snapshot()
    t.append(spark.createDataFrame([("b",)], ["v"]))  # winner: hwm -> 2
    stale = dict(base.properties)
    stale["identity.hwm.id"] = "5"  # delta computed against base
    schema = StructType.fromJson(json.loads(base.schema_json))
    with pytest.raises(ConcurrentWriteError, match="properties changed"):
        t._commit_reconciled(
            [], [], schema, "append", None, base, properties=stale
        )


def test_hwm_rewind_still_conflicts(spark, tmp_path):
    """RESTORE's mark rewind is NOT reconcilable — values the op's
    caller observed could be re-issued after it."""
    import json

    from pyspark.sql.types import StructType

    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    base = t.snapshot()
    t.alter_properties({"identity.hwm.id": "1"})  # simulate a rewind
    schema = StructType.fromJson(json.loads(base.schema_json))
    with pytest.raises(ConcurrentWriteError, match="against its"):
        t._commit_reconciled([], [], schema, "delete", None, base)


# ------------------------------------ 4b. reserve-mode allocation path --


def test_reserve_mode_allocates_same_ids_as_commit_mode(spark, tmp_path):
    """Reserve mode is a pure concurrency upgrade: same unique-set
    allocation, marks identical, data commits carry no property delta."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    t.alter_properties({"identity.allocation.mode": "reserve"})
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    t.append(spark.createDataFrame([("c",)], ["v"]))
    assert _ids(t, spark) == [1, 2, 3]
    assert t.snapshot().properties["identity.hwm.id"] == "3"
    hist = {e["version"]: e for e in t.history()}
    reserves = [e for e in hist.values() if e["op"] == "identity_reserve"]
    assert len(reserves) == 2  # one per allocating batch
    appends = [
        e
        for e in hist.values()
        if e["op"] == "append" and e.get("add")
    ]
    assert all("properties" not in e for e in appends)


def test_reserve_mode_by_default_supplied_values_advance_mark(
    spark, tmp_path
):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id", always=False)
    t.alter_properties({"identity.allocation.mode": "reserve"})
    t.append(
        spark.createDataFrame([(50, "a"), (None, "b")], "id bigint, v string")
    )
    ids = _ids(t, spark)
    assert 50 in ids and len(set(ids)) == 2
    assert t.snapshot().properties["identity.hwm.id"] == "50"
    t.append(spark.createDataFrame([("c",)], ["v"]))
    assert max(_ids(t, spark)) == 51


_WORKER = r"""
import os, sys, time

table_path, proc_id, n_ops, rows_per, barrier = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5]
)
sys.path.insert(0, os.environ["REPO_ROOT"])
from pyspark.sql import SparkSession

from bigdataingestion_spark.sinks.txlog import TxLogTable

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"identity-reserve-stress-{proc_id}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
t = TxLogTable(table_path)

while not os.path.exists(barrier):
    time.sleep(0.02)

for i in range(n_ops):
    df = spark.createDataFrame(
        [(f"{proc_id}-{i}-{j}",) for j in range(rows_per)], ["v"]
    ).coalesce(1)
    # NO retry loop: reserve mode's whole point is that concurrent
    # appends reconcile instead of conflicting
    t.append(df)

spark.stop()
"""


def test_reserve_mode_concurrent_appends_need_no_retries(spark, tmp_path):
    """Cross-process stress, reserve mode: every append succeeds with NO
    caller retry loop (the r9 throughput cliff gone), ids stay globally
    unique, mark == max id, every payload lands exactly once."""
    table = str(tmp_path / "t")
    barrier = str(tmp_path / "go")
    t = TxLogTable(table)
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    t.alter_properties({"identity.allocation.mode": "reserve"})

    env = {
        **os.environ,
        "REPO_ROOT": os.path.dirname(os.path.dirname(__file__)),
    }
    script = str(tmp_path / "worker.py")
    with open(script, "w") as fh:
        fh.write(_WORKER)
    n_ops, rows_per = 5, 7
    procs = [
        subprocess.Popen(
            [sys.executable, script, table, pid, str(n_ops), str(rows_per),
             barrier],
            env=env,
        )
        for pid in ("A", "B")
    ]
    open(barrier, "w").close()
    for p in procs:
        assert p.wait(timeout=600) == 0
    rows = t.read(spark).collect()
    ids = [r["id"] for r in rows]
    expect = 2 * n_ops * rows_per
    assert len(ids) == expect and len(set(ids)) == expect
    assert int(t.snapshot().properties["identity.hwm.id"]) == max(ids)
    assert sorted(r["v"] for r in rows) == sorted(
        f"{p}-{i}-{j}"
        for p in ("A", "B")
        for i in range(n_ops)
        for j in range(rows_per)
    )
