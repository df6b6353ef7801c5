"""Measure the round-7 scale claims: bloom-index skipping on uniform
uuid-ish keys (where min/max is blind) and executor-side RLE deletion
vectors on a wide scattered delete. Prints one JSON line per experiment;
numbers are recorded in SCALE.md.

    PYTHONPATH=/root/repo python scripts/bench_bloom.py [files] [rows_per_file]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from bigdataingestion_spark.session import get_spark
    from bigdataingestion_spark.sinks.txlog import TxLogTable

    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 25_000
    spark = get_spark(app_name="bench-bloom", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="bloom_bench_")
    try:
        # ---- experiment 1: keyed CDC delete, uuid keys, bloom vs none
        def seed(path: str, bloom: bool) -> TxLogTable:
            t = TxLogTable(path)
            t.append(
                spark.range(1).selectExpr("md5('seed') as key", "0L as n")
            )
            if bloom:
                t.alter_properties({"bloom.columns": "key"})
            for g in range(n_files):
                t.append(
                    spark.range(g * rows, (g + 1) * rows)
                    .selectExpr("md5(cast(id as string)) as key", "id as n")
                    .coalesce(1)
                )
            return t

        batch = spark.range(3 * rows, 3 * rows + 100).selectExpr(
            "md5(cast(id as string)) as key", "id as n"
        )
        out = {}
        for label, bloom in (("bloom", True), ("none", False)):
            t = seed(os.path.join(work, label), bloom)
            t0 = time.perf_counter()
            t.delete_matching(spark, batch, keys=["key"])
            wall = time.perf_counter() - t0
            m = t.history()[-1]["op_metrics"]
            out[label] = {
                "wall_sec": round(wall, 3),
                "files_stat_skipped": m["files_stat_skipped"],
                "files_bloom_skipped": m["files_bloom_skipped"],
                "files_rewritten": m["files_rewritten"],
            }
        idx_bytes = sum(
            os.path.getsize(os.path.join(work, "bloom", f))
            for f in os.listdir(os.path.join(work, "bloom"))
            if f.startswith("bloom-")
        )
        print(
            json.dumps(
                {
                    "experiment": "keyed_delete_uuid_keys",
                    "files": n_files + 1,
                    "rows_per_file": rows,
                    "batch_keys": 100,
                    "index_bytes_total": idx_bytes,
                    **out,
                }
            )
        )

        # ---- experiment 2: wide scattered DV delete (executor-side RLE)
        path = os.path.join(work, "dv")
        t = TxLogTable(path)
        total = n_files * rows
        t.append(spark.range(total).selectExpr("id", "id % 97 as m").coalesce(4))
        t0 = time.perf_counter()
        t.delete(spark, "m % 3 = 0", deletion_vectors=True)  # ~1/3 of rows
        wall = time.perf_counter() - t0
        m = t.history()[-1]["op_metrics"]
        snap = t.snapshot()
        dv_bytes = sum(
            os.path.getsize(os.path.join(path, d)) for d in snap.dvs.values()
        )
        runs = sum(len(t._load_dv_runs(d)) for d in snap.dvs.values())
        remaining = t.read(spark).count()
        print(
            json.dumps(
                {
                    "experiment": "wide_scattered_dv_delete",
                    "rows_total": total,
                    "rows_masked": m["rows_masked_total"],
                    "driver_payload_runs": runs,
                    "dv_sidecar_bytes": dv_bytes,
                    "wall_sec": round(wall, 3),
                    "rows_remaining": remaining,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
