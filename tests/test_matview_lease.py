"""Maintenance-lease enforcement of the matview single-maintainer
contract (r14).

The contract was previously documented but trusted; with
``lease_seconds`` set, every maintenance entry point claims/renews a
``matview.lease`` property through a CAS commit
(``alter_properties(expected_version=...)``), so the one unguarded
corruption path — two LIVE maintainers interleaving property commits
and overwrites — becomes a typed refusal
(:class:`MatviewLeaseHeldError`). Covered here:

- in-process contention between two handles (acquire / refuse /
  release / succeed);
- expiry reclaim: an expired lease is claimable (recover() breaking a
  dead maintainer's lease is the same path);
- renewal economy: a steady maintainer does not pay one lease commit
  per refresh;
- the lease survives the fused fold commit (the merge's property rider
  must not drop it);
- TWO LIVE OS PROCESSES: a holder process genuinely alive and holding
  while the second process is refused, then expiry hands over.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.matview import (
    _LEASE_KEY,
    IncrementalAggView,
    IncrementalUnionAggView,
    MatviewLeaseHeldError,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable

SCHEMA = "id long, grp string, val double"


def _src(spark, path, rows):
    t = TxLogTable(str(path))
    t.append(spark.createDataFrame(rows, SCHEMA))
    t.alter_properties({"cdf.enabled": "true"})
    return t


def _mv(src, path, lease=None):
    return IncrementalAggView(
        src,
        str(path),
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
        lease_seconds=lease,
    )


def test_second_live_maintainer_refused_then_release(spark, tmp_path):
    src = _src(spark, tmp_path / "t", [(1, "g0", 1.0), (2, "g1", 2.0)])
    a = _mv(src, tmp_path / "mv", lease=300.0)
    a.build(spark)  # acquires the lease (view exists after first commit)
    src.append(spark.createDataFrame([(3, "g0", 3.0)], SCHEMA))
    a.refresh(spark)
    snap = a.view.snapshot()
    assert json.loads(snap.properties[_LEASE_KEY])["holder"] == a._lease_id

    b = _mv(src, tmp_path / "mv", lease=300.0)
    with pytest.raises(MatviewLeaseHeldError, match="lease held"):
        b.refresh(spark)
    with pytest.raises(MatviewLeaseHeldError):
        b.build(spark)
    with pytest.raises(MatviewLeaseHeldError):
        b.alter(spark, {"hi": ("max", "val")})

    a.release_lease()
    assert _LEASE_KEY not in a.view.snapshot().properties
    src.append(spark.createDataFrame([(4, "g1", 4.0)], SCHEMA))
    b.refresh(spark)  # claims the freed lease
    assert (
        json.loads(a.view.snapshot().properties[_LEASE_KEY])["holder"]
        == b._lease_id
    )
    got = {r["grp"]: (r["n"], r["s"]) for r in b.read(spark).collect()}
    assert got == {"g0": (2, 4.0), "g1": (2, 6.0)}


def test_expired_lease_is_claimable_and_recover_breaks_it(
    spark, tmp_path
):
    src = _src(spark, tmp_path / "t", [(1, "g0", 1.0)])
    a = _mv(src, tmp_path / "mv", lease=1.0)
    a.build(spark)
    src.append(spark.createDataFrame([(2, "g1", 2.0)], SCHEMA))
    a.refresh(spark)  # a holds a 1s lease now; pretend a dies here
    b = _mv(src, tmp_path / "mv", lease=300.0)
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            b.recover(spark)  # breaks the expired lease via the claim path
            break
        except MatviewLeaseHeldError:
            time.sleep(0.2)
    else:
        pytest.fail("expired lease was never reclaimed")
    assert (
        json.loads(b.view.snapshot().properties[_LEASE_KEY])["holder"]
        == b._lease_id
    )


def test_lease_renewal_does_not_commit_per_refresh(spark, tmp_path):
    src = _src(spark, tmp_path / "t", [(1, "g0", 1.0)])
    a = _mv(src, tmp_path / "mv", lease=3600.0)
    a.build(spark)
    src.append(spark.createDataFrame([(2, "g0", 1.0)], SCHEMA))
    a.refresh(spark)  # FIRST claim commits the lease

    def lease_commits():
        return sum(
            1
            for h in a.view.history()
            if h["op"] == "set_properties"
            and "matview.lease" in (h.get("op_metrics") or {}).get("set", [])
        )

    base = lease_commits()
    for i in range(3):
        src.append(
            spark.createDataFrame([(10 + i, "g0", 1.0)], SCHEMA)
        )
        a.refresh(spark)
    # >half of a 1h lease remains: every refresh reuses the claim
    assert lease_commits() == base


def test_lease_survives_fused_fold_commit(spark, tmp_path):
    """The refresh fold commits its cursor as a property RIDER on the
    merge; the rider must merge into the snapshot's properties (which
    hold the lease), not replace them."""
    src = _src(spark, tmp_path / "t", [(1, "g0", 1.0)])
    a = _mv(src, tmp_path / "mv", lease=3600.0)
    a.build(spark)
    src.append(spark.createDataFrame([(2, "g0", 2.0)], SCHEMA))
    a.refresh(spark)  # fold merge with cursor rider
    props = a.view.snapshot().properties
    assert _LEASE_KEY in props
    assert json.loads(props[_LEASE_KEY])["holder"] == a._lease_id


def test_lease_on_union_membership_ops(spark, tmp_path):
    shards = [
        _src(spark, tmp_path / f"s{i}", [(i * 10, f"g{i}", float(i))])
        for i in range(2)
    ]
    a = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
        lease_seconds=300.0,
    )
    a.build(spark)
    a.refresh(spark)  # claims
    b = IncrementalUnionAggView(
        shards,
        str(tmp_path / "mv"),
        ["grp"],
        {"n": ("count", "1")},
        rebuild_ratio=None,
        lease_seconds=300.0,
    )
    new = _src(spark, tmp_path / "s_new", [(100, "g9", 9.0)])
    with pytest.raises(MatviewLeaseHeldError):
        b.attach_shard(spark, new)
    a.attach_shard(spark, new)  # the holder may evolve membership
    with pytest.raises(MatviewLeaseHeldError):
        b.detach_shard(spark, new)
    assert len(a.sources) == 3


_HOLDER = r"""
import json, os, sys, time

view_path, src_path, ready_path = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, os.environ["REPO_ROOT"])
from pyspark.sql import SparkSession

from bigdataingestion_spark.sinks.matview import IncrementalAggView
from bigdataingestion_spark.sinks.txlog import TxLogTable

spark = (
    SparkSession.builder.master("local[2]")
    .appName("mv-lease-holder")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
src = TxLogTable(src_path)
mv = IncrementalAggView(
    src, view_path, ["grp"],
    {"n": ("count", "1"), "s": ("sum", "val")},
    rebuild_ratio=None, lease_seconds=20.0,
)
mv.refresh(spark)  # claims the lease and stays ALIVE holding it
with open(ready_path, "w") as fh:
    fh.write("held")
time.sleep(45)  # hold (without renewing) until killed by the parent
os._exit(0)
"""


def test_two_live_processes_contend_then_expiry_hands_over(
    spark, tmp_path
):
    src = _src(
        spark, tmp_path / "t", [(1, "g0", 1.0), (2, "g1", 2.0)]
    )
    view_path = str(tmp_path / "mv")
    mine = _mv(src, view_path, lease=20.0)
    mine.build(spark)
    mine.release_lease()  # hand the view over to the holder process

    py = str(tmp_path / "holder.py")
    with open(py, "w") as fh:
        fh.write(_HOLDER)
    ready = str(tmp_path / "ready")
    env = {
        **os.environ,
        "REPO_ROOT": os.path.dirname(os.path.dirname(__file__)),
    }
    proc = subprocess.Popen(
        [sys.executable, py, view_path, src.path, ready],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 120
        while not os.path.exists(ready):
            assert proc.poll() is None, "holder process died early"
            assert time.time() < deadline, "holder never claimed"
            time.sleep(0.2)
        # the OTHER process is LIVE and holds the lease: typed refusal
        with pytest.raises(MatviewLeaseHeldError, match="lease held"):
            mine.refresh(spark)
    finally:
        proc.kill()
        proc.wait()
    # holder is dead; once its 20s lease expires the claim succeeds
    src.append(spark.createDataFrame([(3, "g0", 3.0)], SCHEMA))
    deadline = time.time() + 60
    while True:
        try:
            mine.refresh(spark)
            break
        except MatviewLeaseHeldError:
            assert time.time() < deadline, "lease never expired"
            time.sleep(0.5)
    got = {
        r["grp"]: (r["n"], r["s"]) for r in mine.read(spark).collect()
    }
    assert got == {"g0": (2, 4.0), "g1": (1, 2.0)}
