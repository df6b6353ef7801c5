"""Round-11 scale measurement: union-view maintenance across shards.

    python scripts/bench_union_view.py

Two 4M-row shards (group-range-clustered), count/sum by 20k groups:
full build (union scan) vs one-shard additive refresh vs both-shard
refresh vs the recompute path after a delete, with per-shard summed
files-pruned metrics.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdataingestion_spark.session import get_spark  # noqa: E402
from bigdataingestion_spark.sinks.matview import (  # noqa: E402
    IncrementalUnionAggView,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable  # noqa: E402

N_PER_SHARD = 4_000_000
N_GROUPS = 20_000
N_FILES = 32


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.2f} s")
    return out


def main():
    spark = get_spark(
        app_name="bench-union-view", master="local[32]",
        shuffle_partitions=32,
    )
    work = Path(tempfile.mkdtemp(prefix="bench_union_"))
    try:
        shards = []
        for i in range(2):
            t = TxLogTable(str(work / f"s{i}"))
            rows = (
                spark.range(N_PER_SHARD)
                .select(
                    (F.col("id") * 2 + i).alias("id"),
                    (F.col("id") % N_GROUPS).alias("g"),
                    (F.col("id") % 997).cast("double").alias("v"),
                )
                .repartitionByRange(N_FILES, "g")
                .sortWithinPartitions("g")
            )
            t.append(rows)
            t.alter_properties({"cdf.enabled": "true"})
            shards.append(t)
        print(f"2 shards x {N_PER_SHARD} rows, {N_FILES} clustered files each")
        mv = IncrementalUnionAggView(
            shards, str(work / "mv"), ["g"],
            {"n": ("count", "1"), "s": ("sum", "v")},
            rebuild_ratio=None,
        )
        timed("union build (8M rows total)", lambda: mv.build(spark))

        shards[0].append(
            spark.range(8_000).select(
                (F.col("id") + 10_000_000).alias("id"),
                (F.col("id") % 100).alias("g"),
                F.lit(1.0).alias("v"),
            )
        )
        timed("additive refresh, ONE shard moved (8k rows)",
              lambda: mv.refresh(spark))

        for t in shards:
            t.append(
                spark.range(8_000).select(
                    (F.col("id") + 20_000_000).alias("id"),
                    (F.col("id") % 100).alias("g"),
                    F.lit(2.0).alias("v"),
                )
            )
        timed("additive refresh, BOTH shards moved (16k rows)",
              lambda: mv.refresh(spark))

        mv2 = IncrementalUnionAggView(
            shards, str(work / "mv2"), ["g"],
            {"mx": ("max", "v")},
            rebuild_ratio=None,
        )
        timed("min/max union build", lambda: mv2.build(spark))
        shards[1].delete(spark, "g >= 100 AND g < 200 AND v > 500")
        timed("recompute refresh (delete in one shard, 100-group span)",
              lambda: mv2.refresh(spark))
        print(f"  files scanned (summed over shards): "
              f"{mv2.last_recompute_files[0]}/{mv2.last_recompute_files[1]}")
        timed("full union re-build (yardstick)", lambda: mv.build(spark))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
