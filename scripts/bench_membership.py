"""Measure the r13 evolution operations against their rebuild
alternative — the cost question they exist to answer at 100 TB:

1. attach_shard on a sharded union rollup vs build() of the extended
   membership: the attach folds ONLY the new shard's snapshot
   (O(new shard)), the rebuild re-reads every shard (O(all shards)).
2. alter(add_aggs=...) on a wide aggregate view vs build() of the
   extended definition: the alter aggregates only the NEW columns in
   one anchored read; the rebuild recomputes every aggregate.

Synthetic data via spark.range (independent of the fixtures); sizes
are CLI-tunable. Prints one JSON line.

Usage: python scripts/bench_membership.py [rows_per_shard] [new_shard_rows] [groups]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _shard_df(spark, n, offset, groups=1000):
    from pyspark.sql import functions as F

    return (
        spark.range(offset, offset + n)
        .withColumn("grp", (F.col("id") % groups).cast("long"))
        .withColumn(
            "val", (F.col("id") % 9973).cast("double") / F.lit(7.0)
        )
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    new_n = int(sys.argv[2]) if len(sys.argv) > 2 else n // 2
    groups = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    from bigdataingestion_spark.session import get_spark
    from bigdataingestion_spark.sinks.matview import (
        IncrementalAggView,
        IncrementalUnionAggView,
    )
    from bigdataingestion_spark.sinks.txlog import TxLogTable

    spark = get_spark(app_name="membership-bench")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="mv-membership-bench-")
    out = {"metric": "membership_evolution", "rows_per_shard": n,
           "new_shard_rows": new_n, "groups": groups}
    try:
        # ---- 1. attach vs rebuild --------------------------------
        shards = []
        for i in range(2):
            t = TxLogTable(f"{work}/s{i}")
            t.append(_shard_df(spark, n, i * n, groups))
            t.alter_properties({"cdf.enabled": "true"})
            shards.append(t)
        new = TxLogTable(f"{work}/s_new")
        new.append(_shard_df(spark, new_n, 10 * n, groups))
        new.alter_properties({"cdf.enabled": "true"})
        aggs = {"n_rows": ("count", "1"), "s_val": ("sum", "val")}
        mv = IncrementalUnionAggView(
            # rebuild_ratio=None PINS the fold: the point is to time
            # attach's incremental path against the rebuild, and large
            # CLI shard sizes would otherwise trip the cost fallback
            # and silently time a rebuild against a rebuild
            shards, f"{work}/mv_attach", ["grp"], aggs,
            rebuild_ratio=None,
        )
        mv.build(spark)
        t0 = time.time()
        mv.attach_shard(spark, new)
        out["attach_sec"] = max(round(time.time() - t0, 2), 0.01)
        rebuild = IncrementalUnionAggView(
            [*shards, new], f"{work}/mv_rebuild", ["grp"], aggs
        )
        t0 = time.time()
        rebuild.build(spark)
        out["rebuild_union_sec"] = round(time.time() - t0, 2)
        out["attach_speedup"] = round(
            out["rebuild_union_sec"] / out["attach_sec"], 2
        )

        # ---- 2. alter vs rebuild ---------------------------------
        src = TxLogTable(f"{work}/fact")
        src.append(_shard_df(spark, 2 * n, 0, groups))
        src.alter_properties({"cdf.enabled": "true"})
        wide = {
            f"a{i}": ("sum", f"val * {i + 1}") for i in range(8)
        } | {"n_rows": ("count", "1")}
        mv2 = IncrementalAggView(src, f"{work}/mv_alter", ["grp"], wide)
        mv2.build(spark)
        t0 = time.time()
        mv2.alter(
            spark,
            {"lo": ("min", "val"), "hi": ("max", "val")},
        )
        out["alter_sec"] = max(round(time.time() - t0, 2), 0.01)
        full = wide | {"lo": ("min", "val"), "hi": ("max", "val")}
        mv3 = IncrementalAggView(src, f"{work}/mv_alter_rb", ["grp"], full)
        t0 = time.time()
        mv3.build(spark)
        out["rebuild_alter_sec"] = round(time.time() - t0, 2)
        out["alter_speedup"] = round(
            out["rebuild_alter_sec"] / out["alter_sec"], 2
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
