"""Cross-OS-process crash/resume stress for union-view shard membership
evolution (r13, attach_shard / detach_shard).

The in-process crash simulations in test_round13.py inject exceptions;
here the attaching PROCESS genuinely dies (os._exit) at each of the two
interesting points of the attach protocol —

1. AFTER the pending property, BEFORE any fold commit;
2. AFTER the fold commit (which carries the membership rider, so the
   attach is already COMPLETE — there is no partial post-fold state);

— and a separate session (the parent) recovers. Invariants:

- death #1: ``recover()`` RESUMES the attach from the recorded pending
  path (never a rebuild: zero ``overwrite`` commits after the build);
- death #2: the pending is already cleared (the fold commit cleared it
  atomically) and ``recover()`` on a stale pre-attach handle ADOPTS
  the stored membership instead of rebuilding;
- either way the fold lands exactly once (exactly one merge commit in
  the final history), the final state equals the from-scratch
  aggregate of the full membership, and normal refresh works
  afterwards.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

_ATTACHER = r"""
import json, os, sys

view_path, shards_json, new_path, stage = (
    sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
)
sys.path.insert(0, os.environ["REPO_ROOT"])
from pyspark.sql import SparkSession

from bigdataingestion_spark.sinks import matview as mvmod
from bigdataingestion_spark.sinks.matview import IncrementalUnionAggView
from bigdataingestion_spark.sinks.txlog import TxLogTable

spark = (
    SparkSession.builder.master("local[2]")
    .appName("mv-attacher")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
shards = [TxLogTable(p) for p in json.loads(shards_json)]
mv = IncrementalUnionAggView(
    shards, view_path, ["grp"],
    {"n": ("count", "1"), "s": ("sum", "val")},
    rebuild_ratio=None,
)
new = TxLogTable(new_path)
if stage == "kill_before_fold":
    real_merge = mv.view.merge

    def dying_merge(*a, **k):
        os._exit(18)  # pending is set; nothing folded yet

    mv.view.merge = dying_merge
elif stage == "kill_after_fold":
    real_merge = mv.view.merge

    def dying_merge(*a, **k):
        real_merge(*a, **k)
        os._exit(17)  # fold + membership rider committed atomically

    mv.view.merge = dying_merge
mv.attach_shard(spark, new)
os._exit(0)
"""

SCHEMA = "id long, grp string, val double"


@pytest.mark.parametrize(
    "stage,rc", [("kill_before_fold", 18), ("kill_after_fold", 17)]
)
def test_attach_process_death_then_recover(spark, tmp_path, stage, rc):
    from bigdataingestion_spark.sinks.matview import (
        _ATTACH_PENDING_KEY,
        IncrementalUnionAggView,
        MatviewDefinitionError,
    )
    from bigdataingestion_spark.sinks.txlog import TxLogTable

    shards = []
    for i in range(2):
        t = TxLogTable(str(tmp_path / f"s{i}"))
        t.append(
            spark.createDataFrame(
                [
                    (j, f"g{j % 3}", float(j))
                    for j in range(1, 25)
                    if j % 2 == i
                ],
                SCHEMA,
            )
        )
        t.alter_properties({"cdf.enabled": "true"})
        shards.append(t)
    new = TxLogTable(str(tmp_path / "s_new"))
    new.append(
        spark.createDataFrame(
            [(100 + j, f"g{j % 3}", 1000.0 + j) for j in range(9)], SCHEMA
        )
    )
    new.alter_properties({"cdf.enabled": "true"})
    view_path = str(tmp_path / "mv")
    mv = IncrementalUnionAggView(
        shards,
        view_path,
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    mv.build(spark)

    py = str(tmp_path / "attacher.py")
    with open(py, "w") as fh:
        fh.write(_ATTACHER)
    env = {
        **os.environ,
        "REPO_ROOT": os.path.dirname(os.path.dirname(__file__)),
    }
    proc = subprocess.run(
        [
            sys.executable,
            py,
            view_path,
            json.dumps([t.path for t in shards]),
            new.path,
            stage,
        ],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        timeout=600,
    )
    assert proc.returncode == rc, f"attacher must die at {stage}"

    fresh = IncrementalUnionAggView(
        shards,
        view_path,
        ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
        rebuild_ratio=None,
    )
    snap = fresh.view.snapshot()
    if stage == "kill_before_fold":
        # pending marker left behind; maintenance refuses until resumed
        assert _ATTACH_PENDING_KEY in snap.properties
        with pytest.raises(
            MatviewDefinitionError, match="interrupted attach"
        ):
            fresh.refresh(spark)
    else:
        # the fold commit carried the membership rider: the attach is
        # COMPLETE, pending cleared atomically — the stale handle just
        # sees a definition mismatch
        assert _ATTACH_PENDING_KEY not in snap.properties
        with pytest.raises(MatviewDefinitionError):
            fresh.refresh(spark)

    # recover() in a DIFFERENT process/session resumes (death #1) or
    # adopts the committed membership (death #2) — never a rebuild,
    # fold landed exactly once
    fresh.recover(spark)
    assert [t.path for t in fresh.sources] == [
        t.path for t in [*shards, new]
    ]
    ops = [h["op"] for h in fresh.view.history()]
    assert ops.count("overwrite") == 0, f"resume must not rebuild: {ops}"
    assert ops.count("merge") == 1, f"fold must land exactly once: {ops}"
    snap = fresh.view.snapshot()
    assert _ATTACH_PENDING_KEY not in snap.properties

    # normal maintenance continues over the full membership
    new.append(spark.createDataFrame([(500, "g1", 7.0)], SCHEMA))
    shards[0].delete(spark, "id % 5 = 0")
    fresh.refresh(spark)
    u = None
    for t in fresh.sources:
        fr = t.read(spark)
        u = fr if u is None else u.unionByName(fr)
    want = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in u.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    got = {
        r["grp"]: (r["n"], round(r["s"], 6))
        for r in fresh.read(spark).collect()
    }
    assert got == want
