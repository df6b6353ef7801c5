"""Identity allocation under REAL concurrent writers: two separate Spark
processes append batches to one GENERATED ALWAYS AS IDENTITY table with
caller-side retry loops (the documented contract: a lost high-water-mark
race raises ConcurrentWriteError and the caller redoes the append, which
re-allocates from the winner's mark). Invariants, valid under any
interleaving:

1. every allocated id is globally UNIQUE — the property-conflict rule
   means two writers can never commit ranges drawn from the same mark;
2. the final mark equals the max allocated id;
3. no rows are lost or duplicated (each worker's payload lands once).
"""

from __future__ import annotations

import os
import subprocess
import sys

_WORKER = r"""
import os, sys, time

table_path, proc_id, n_ops, rows_per, barrier = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5]
)
sys.path.insert(0, os.environ["REPO_ROOT"])
from pyspark.sql import SparkSession

from bigdataingestion_spark.sinks.txlog import (
    ConcurrentWriteError,
    TxLogTable,
)

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"identity-stress-{proc_id}")
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
    for attempt in range(60):  # the documented retry contract
        try:
            t.append(df)
            break
        except ConcurrentWriteError:
            time.sleep(0.01 * (attempt + 1))
    else:
        raise SystemExit(f"worker {proc_id}: append {i} starved")

spark.stop()
"""


def test_concurrent_identity_writers_allocate_disjoint_ranges(
    spark, tmp_path
):
    table = str(tmp_path / "t")
    barrier = str(tmp_path / "go")
    from bigdataingestion_spark.sinks.txlog import TxLogTable

    t = TxLogTable(table)
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")

    env = {**os.environ, "REPO_ROOT": os.path.dirname(os.path.dirname(__file__))}
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
    out = t.read(spark)
    rows = out.collect()
    ids = [r["id"] for r in rows]
    vals = [r["v"] for r in rows]
    expect = 2 * n_ops * rows_per
    # 1. globally unique ids
    assert len(ids) == expect and len(set(ids)) == expect
    # 2. mark == max id
    assert int(t.snapshot().properties["identity.hwm.id"]) == max(ids)
    # 3. every payload landed exactly once
    assert sorted(vals) == sorted(
        f"{p}-{i}-{j}"
        for p in ("A", "B")
        for i in range(n_ops)
        for j in range(rows_per)
    )
    # every data commit (past the bootstrap + declaration) is an append
    ops = [e["op"] for e in t.history()]
    assert ops.count("append") == 2 * n_ops + 1
