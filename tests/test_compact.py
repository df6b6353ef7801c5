"""Compaction and clustered-rewrite maintenance jobs."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.compact import cluster_rewrite, compact_path


def _parquet_files(path):
    return [
        f
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
        if "/_" not in f
    ]


def test_compact_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "many")
    spark.range(10_000).repartition(20).write.parquet(path)
    assert len(_parquet_files(path)) == 20
    before = spark.read.parquet(path).agg(F.sum("id")).first()[0]
    n = compact_path(spark, path, target_file_mb=256)
    assert n == 1
    assert len(_parquet_files(path)) == 1
    assert spark.read.parquet(path).agg(F.sum("id")).first()[0] == before


def test_cluster_rewrite_sorts_by_key(spark, tmp_path):
    path = str(tmp_path / "clustered")
    df = spark.range(10_000).select(
        (F.col("id") * 2654435761 % 10_000).alias("key"), F.col("id").alias("v")
    )
    df.repartition(8).write.parquet(path)
    cluster_rewrite(spark, path, ["key"], num_files=4)
    out = spark.read.parquet(path)
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    # range clustering: per-file key ranges must be (nearly) disjoint —
    # check that each file's span is far below the global span
    import pyarrow.parquet as pq

    spans = []
    for f in _parquet_files(path):
        meta = pq.ParquetFile(f)
        stats = [
            meta.metadata.row_group(i).column(0).statistics
            for i in range(meta.metadata.num_row_groups)
        ]
        lo = min(s.min for s in stats)
        hi = max(s.max for s in stats)
        spans.append((lo, hi))
    spans.sort()
    overlaps = sum(
        1 for (a, b) in zip(spans, spans[1:]) if a[1] > b[0]
    )
    assert overlaps == 0, f"file key ranges overlap: {spans}"
