"""Lake maintenance: small-file compaction and range-clustered rewrites.

The reference's answer to small files is ``coalesce(1)`` on every write —
right for tiny tables, a single-task bottleneck for everything else. These
utilities are the scale-correct replacements, run as maintenance jobs:

  * ``compact_path`` — bin-pack a directory's files to a target size
    (read -> repartition to ceil(bytes/target) -> atomic staging swap).
  * ``cluster_rewrite`` — rewrite range-partitioned AND sorted by given
    keys, so parquet row-group min/max statistics line up with common
    predicates and scans prune aggressively (poor man's Z-order for the
    single-key case).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _swap_in(merged_writer, target_path: str) -> None:
    staging = f"{target_path}.staging-{uuid.uuid4().hex[:8]}"
    merged_writer(staging)
    backup = f"{target_path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(target_path, backup)
    os.rename(staging, target_path)
    shutil.rmtree(backup)


def compact_path(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    fmt: str = "parquet",
) -> int:
    """Rewrite a directory to ~target-sized files. Returns the new file
    count. Atomic: readers see either the old or the new layout."""
    size = _dir_bytes(path)
    n_files = max(1, math.ceil(size / (target_file_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)

    def write(staging: str) -> None:
        df.repartition(n_files).write.format(fmt).save(staging)

    _swap_in(write, path)
    return n_files


def cluster_rewrite(
    spark: SparkSession,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Rewrite range-partitioned + sorted by ``cluster_cols`` so row-group
    statistics prune scans filtered on those columns."""
    df = spark.read.format(fmt).load(path)
    parts = num_files or max(
        1, math.ceil(_dir_bytes(path) / (256 * 1024 * 1024))
    )
    clustered = df.repartitionByRange(parts, *cluster_cols).sortWithinPartitions(
        *cluster_cols
    )

    def write(staging: str) -> None:
        clustered.write.format(fmt).save(staging)

    _swap_in(write, path)
