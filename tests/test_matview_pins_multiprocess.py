"""Multi-process stress for pin-protected dimension maintenance (r12).

The register_pins contract under REAL concurrency: while one process
continuously rewrites a dimension (CoW updates), sprinkles metadata
noise (property commits), and runs ZERO-RETENTION vacuums, another
process keeps a join view current with incremental dim folds. The
vacuum floor must make this safe end to end:

1. the maintainer NEVER hits an unreplayable window — the floor keeps
   the pinned snapshot and the change history since it alive through
   every vacuum, whatever the interleaving;
2. the view NEVER falls back to a rebuild (no ``overwrite`` commit
   after the initial build) — the incremental path holds;
3. floor-advance property commits racing the churner's writes are
   retried/swallowed (``_advance_floor``), never failing a fold whose
   state already committed;
4. after both processes finish, one recover() in the parent brings the
   view to EXACTLY the from-scratch aggregate of the final fact ⋈ dim.

The schedule is nondeterministic; the invariants are not.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from pyspark.sql import functions as F

_MAINTAINER = r"""
import json, os, sys, time

view_path, fact_path, dim_path, barrier, results_path, run_secs = (
    sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5],
    float(sys.argv[6]),
)
sys.path.insert(0, os.environ["REPO_ROOT"])
from pyspark.sql import SparkSession

from bigdataingestion_spark.sinks.matview import (
    DimJoin,
    IncrementalJoinAggView,
    MatviewStaleDimensionError,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable

spark = (
    SparkSession.builder.master("local[2]")
    .appName("mv-pin-maintainer")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
fact, dim = TxLogTable(fact_path), TxLogTable(dim_path)
mv = IncrementalJoinAggView(
    fact, view_path, ["dname"],
    {"n": ("count", "1"), "s": ("sum", "amount")},
    [DimJoin(dim, on=[("dk", "dkey")])],
    rebuild_ratio=None,
    register_pins=True,
)
res = {"loops": 0, "pin_advances": 0, "stale_races": 0, "error": None}
while not os.path.exists(barrier):
    time.sleep(0.02)
deadline = time.time() + run_secs
try:
    while time.time() < deadline:
        before = mv._pinned_dim_versions(mv.view.snapshot())
        mv.refresh_dimensions(spark)
        try:
            mv.refresh(spark)
        except MatviewStaleDimensionError:
            # the dim moved between the fold and the refresh — the
            # next loop iteration folds it; a legitimate race, counted
            res["stale_races"] += 1
        after = mv._pinned_dim_versions(mv.view.snapshot())
        res["loops"] += 1
        if after != before:
            # only pin movement counts as a FOLD actually happening —
            # a loop spin against an idle dim proves nothing
            res["pin_advances"] += 1
        time.sleep(0.15)
except Exception as e:  # any OTHER failure breaks the contract
    res["error"] = f"{type(e).__name__}: {e}"
with open(results_path, "w") as fh:
    json.dump(res, fh)
spark.stop()
sys.exit(1 if res["error"] else 0)
"""

_CHURNER = r"""
import json, os, sys, time

dim_path, barrier, results_path, n_ops = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
)
sys.path.insert(0, os.environ["REPO_ROOT"])
from pyspark.sql import SparkSession

from bigdataingestion_spark.sinks.txlog import TxLogTable

spark = (
    SparkSession.builder.master("local[2]")
    .appName("mv-pin-churner")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
dim = TxLogTable(dim_path)
res = {"updates": 0, "vacuums": 0, "vacuumed_files": 0, "error": None}
while not os.path.exists(barrier):
    time.sleep(0.02)
try:
    for i in range(n_ops):
        dim.update(
            spark, f"dkey = {i % 4}", {"dname": f"'D{i % 3}'"}
        )
        res["updates"] += 1
        if i % 3 == 0:
            dim.alter_properties({"churn.noise": str(i)})
        if i % 2 == 1:
            # ZERO retention: anything the floor does not protect dies
            res["vacuumed_files"] += len(dim.vacuum(retention_seconds=0))
            res["vacuums"] += 1
        time.sleep(0.05)
except Exception as e:
    res["error"] = f"{type(e).__name__}: {e}"
with open(results_path, "w") as fh:
    json.dump(res, fh)
spark.stop()
sys.exit(1 if res["error"] else 0)
"""


def test_pinned_view_survives_concurrent_dim_churn_and_vacuum(spark, tmp_path):
    from bigdataingestion_spark.sinks.matview import (
        DimJoin,
        IncrementalJoinAggView,
    )
    from bigdataingestion_spark.sinks.txlog import TxLogTable

    fact = TxLogTable(str(tmp_path / "fact"))
    fact.append(
        spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(1, 41)],
            "id long, dk long, amount double",
        )
    )
    fact.alter_properties({"cdf.enabled": "true"})
    dim = TxLogTable(str(tmp_path / "dim"))
    dim.append(
        spark.createDataFrame(
            [(k, f"D{k % 2}") for k in range(4)], "dkey long, dname string"
        )
    )
    dim.alter_properties({"cdf.enabled": "true"})
    view_path = str(tmp_path / "mv")
    mv = IncrementalJoinAggView(
        fact,
        view_path,
        ["dname"],
        {"n": ("count", "1"), "s": ("sum", "amount")},
        [DimJoin(dim, on=[("dk", "dkey")])],
        rebuild_ratio=None,
        register_pins=True,
    )
    mv.build(spark)

    barrier = str(tmp_path / "go")
    env = {**os.environ, "REPO_ROOT": os.path.dirname(os.path.dirname(__file__))}
    scripts = {
        "maintainer": (_MAINTAINER, [view_path, fact.path, dim.path]),
        "churner": (_CHURNER, [dim.path]),
    }
    procs, result_paths = {}, {}
    for name, (src, args) in scripts.items():
        py = str(tmp_path / f"{name}.py")
        with open(py, "w") as fh:
            fh.write(src)
        rp = str(tmp_path / f"res_{name}.json")
        result_paths[name] = rp
        extra = (
            [barrier, rp, "45"] if name == "maintainer" else [barrier, rp, "14"]
        )
        procs[name] = subprocess.Popen(
            [sys.executable, py, *args, *extra],
            env=env,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
    open(barrier, "w").close()
    codes = {n: p.wait(timeout=900) for n, p in procs.items()}
    results = {n: json.load(open(rp)) for n, rp in result_paths.items()}
    assert codes == {"maintainer": 0, "churner": 0}, results
    assert results["maintainer"]["error"] is None, results
    assert results["churner"]["error"] is None, results
    # the race actually happened: dims churned, vacuums ran, folds
    # advanced pins at least once under fire
    assert results["churner"]["updates"] >= 10
    assert results["churner"]["vacuums"] >= 3
    assert results["maintainer"]["pin_advances"] >= 1, results

    # invariant 2: the incremental path held — no rebuild ever
    ops = [h["op"] for h in mv.view.history()]
    assert "overwrite" not in ops, ops

    # invariant 4: one recover() lands on the from-scratch truth
    mv.recover(spark)
    got = {
        r["dname"]: (r["n"], round(r["s"], 6))
        for r in mv.read(spark).collect()
    }
    j = fact.read(spark).join(dim.read(spark), F.col("dk") == F.col("dkey"))
    want = {
        r["dname"]: (r["n"], round(r["s"], 6))
        for r in j.groupBy("dname")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s"))
        .collect()
    }
    assert got == want
    # ... and still no rebuild even through recover()
    ops = [h["op"] for h in mv.view.history()]
    assert "overwrite" not in ops, ops
