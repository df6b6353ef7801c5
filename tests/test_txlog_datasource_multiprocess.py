"""Multi-process concurrent writers through format("txlog").

`test_txlog_multiprocess.py` proves the commit protocol under two racing
PROGRAMMATIC writers (TxLogTable.append with explicit retry loops). This
test drives the same race through the Python Data Source write path —
`df.write.format("txlog").mode("append")` from two separate Spark
processes — where retries happen inside `TxLogTable.commit_files` with
`cleanup_on_conflict=False` (the staged files cannot be re-created, so
losing the create-exclusive race must retry the COMMIT, never delete the
data). Invariants, valid under any interleaving:

1. contiguous versions, one commit per version;
2. every row either writer wrote is present exactly once (no lost
   commits, no duplicates from retries);
3. no staging dirs left behind.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_WORKER = r"""
import os, sys, time

table_path, proc_id, n_ops, barrier = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
)
sys.path.insert(0, os.environ["REPO_ROOT"])
from pyspark.sql import SparkSession

from bigdataingestion_spark.sources.txlog_datasource import register

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"txlog-ds-stress-{proc_id}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
register(spark)

while not os.path.exists(barrier):
    time.sleep(0.02)

for i in range(n_ops):
    df = spark.createDataFrame([(proc_id, i)], ["proc", "i"]).coalesce(1)
    df.write.format("txlog").mode("append").save(table_path)

spark.stop()
"""


def test_vacuum_racing_writer_never_deletes_in_flight_work(spark, tmp_path):
    """The Delta VACUUM contract under a REAL concurrent writer: a vacuum
    loop with the default retention runs continuously while another
    process appends through format("txlog"). Staged and freshly-renamed
    files are always inside the retention window, so vacuum must delete
    NOTHING and the final table must hold every appended row."""
    from bigdataingestion_spark.sinks.txlog import TxLogTable

    table_path = str(tmp_path / "t")
    barrier = str(tmp_path / "go")
    worker_py = str(tmp_path / "worker.py")
    with open(worker_py, "w") as fh:
        fh.write(_WORKER)

    n_ops = 6
    env = {**os.environ, "REPO_ROOT": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
    proc = subprocess.Popen(
        [sys.executable, worker_py, table_path, "w", str(n_ops), barrier],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    open(barrier, "w").close()
    t = TxLogTable(table_path)
    deleted = []
    while proc.poll() is None:
        if os.path.isdir(table_path):
            deleted += t.vacuum()  # default 7-day retention
    assert proc.wait(timeout=600) == 0
    assert deleted == []
    got = sorted((r.proc, r.i) for r in t.read(spark).collect())
    assert got == [("w", i) for i in range(n_ops)]


def test_two_process_datasource_appends_no_lost_rows(spark, tmp_path):
    table_path = str(tmp_path / "t")
    barrier = str(tmp_path / "go")
    worker_py = str(tmp_path / "worker.py")
    with open(worker_py, "w") as fh:
        fh.write(_WORKER)

    n_ops = 8
    env = {**os.environ, "REPO_ROOT": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
    procs = []
    for pid in ("pA", "pB"):
        procs.append(
            subprocess.Popen(
                [sys.executable, worker_py, table_path, pid, str(n_ops), barrier],
                env=env,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        )
    open(barrier, "w").close()
    for p in procs:
        assert p.wait(timeout=600) == 0

    from bigdataingestion_spark.sinks.txlog import TxLogTable

    t = TxLogTable(table_path)
    hist = t.history()

    # contiguous versions, one commit per version, all appends
    assert [e["version"] for e in hist] == list(range(len(hist)))
    assert len(hist) == 2 * n_ops
    assert all(e["op"] == "append" for e in hist)

    # every row exactly once — losing a race must not delete staged data
    # (cleanup_on_conflict=False) nor double-commit it on retry
    got = sorted((r.proc, r.i) for r in t.read(spark).collect())
    assert got == sorted(
        (pid, i) for pid in ("pA", "pB") for i in range(n_ops)
    )

    # happy-path commits clean their staging dirs
    assert not [
        d for d in os.listdir(table_path) if d.startswith("_staging")
    ]
