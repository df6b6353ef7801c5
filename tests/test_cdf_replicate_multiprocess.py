"""Cross-process CDC replication stress: a SEPARATE OS process churns the
source table (appends, deletes, updates, merges) while this process
repeatedly drains `stream_cdf_replicate` catch-up runs against it. This
is the deployment shape the replicator advertises — a live writer it
does not coordinate with — and the exact scenario of the round-7
bootstrap TOCTOU fix (a commit landing between the bootstrap probe and
copy must not be double-applied).

Invariant: after the writer exits and one final catch-up drains, the
replica's content equals the source's snapshot exactly. Intermediate
drains may observe any prefix of the source history; the final one must
converge."""

from __future__ import annotations

import os
import subprocess
import sys
import time

from bigdataingestion_spark.sinks.txlog import TxLogTable

_WORKER = r"""
import os, sys, time

src_path, n_rounds, barrier = sys.argv[1], int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, os.environ["REPO_ROOT"])
from pyspark.sql import SparkSession

from bigdataingestion_spark.sinks.txlog import TxLogTable

spark = (
    SparkSession.builder.master("local[2]")
    .appName("cdf-writer")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
t = TxLogTable(src_path)
t.append(spark.createDataFrame([(0, "seed")], ["id", "v"]))
t.alter_properties({"cdf.enabled": "true"})

while not os.path.exists(barrier):
    time.sleep(0.02)

for i in range(1, n_rounds + 1):
    base = i * 100
    t.append(
        spark.createDataFrame(
            [(base + j, f"r{i}") for j in range(3)], ["id", "v"]
        )
    )
    if i % 2 == 0:
        t.delete(spark, f"id = {base}")  # CoW delete of a fresh row
    if i % 3 == 0:
        t.update(spark, f"id = {base + 1}", {"v": "'UP'"})
    if i % 4 == 0:
        t.merge_upsert(
            spark,
            spark.createDataFrame([(base + 2, "MG"), (base + 50, "NEW")], ["id", "v"]),
            keys=["id"],
        )
spark.stop()
"""


def test_replica_converges_against_live_writer(spark, tmp_path):
    src_path = str(tmp_path / "src")
    dst_path = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    barrier = str(tmp_path / "go")
    worker_py = str(tmp_path / "writer.py")
    with open(worker_py, "w") as fh:
        fh.write(_WORKER)

    from bigdataingestion_spark.streaming.ingest import stream_cdf_replicate

    env = {
        **os.environ,
        "REPO_ROOT": os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        ),
    }
    n_rounds = 6
    proc = subprocess.Popen(
        [sys.executable, worker_py, src_path, str(n_rounds), barrier],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        # wait for the writer to create + cdf-enable the source
        deadline = time.time() + 240
        src = TxLogTable(src_path)
        while time.time() < deadline:
            snap = src.snapshot()
            if snap is not None and snap.properties.get("cdf.enabled") == "true":
                break
            time.sleep(0.1)
        else:
            raise AssertionError("writer never initialized the source")
        open(barrier, "w").close()

        # drain catch-up runs WHILE the writer churns — each run starts
        # mid-history; bootstrap=True on the first run exercises the
        # pinned-snapshot race path against genuinely racing commits
        first = True
        while proc.poll() is None:
            q = stream_cdf_replicate(
                spark, src_path, dst_path, ck, keys=["id"], bootstrap=first
            )
            assert q.awaitTermination(240), "catch-up run timed out"
            first = False
        assert proc.wait(timeout=600) == 0

        # final drain after the writer exits -> exact convergence
        q = stream_cdf_replicate(spark, src_path, dst_path, ck, keys=["id"])
        assert q.awaitTermination(240)
        dst = TxLogTable(dst_path)
        want = sorted((r.id, r.v) for r in src.read(spark).collect())
        got = sorted((r.id, r.v) for r in dst.read(spark).collect())
        assert got == want, (len(got), len(want))
        assert len(want) >= n_rounds * 3 - n_rounds // 2  # sanity: real churn
    finally:
        if proc.poll() is None:
            proc.kill()
