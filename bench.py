"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect) on a shared
session; a tiny warm-up query runs first so JVM/codegen startup isn't
attributed to the first headliner.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigdataingestion_spark import catalog
from bigdataingestion_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="bdi-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: session, codegen, parquet footer caches
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    catalog.q1_pricing_summary(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, fn in catalog.headline_queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
