"""Round-11 scale measurements: top-k view maintenance and BPE learning.

Reproduces the SCALE.md "Round 11: top-k views, BPE" rows:

    python scripts/bench_topk_bpe.py

- Top-k view over an 8M-row fact (64 files, group-range-clustered):
  full build vs insert-only fold refresh (append window) vs
  affected-group recompute refresh (delete window), with the
  files-scanned prune metric from `last_recompute_files`.
- BPE: word-vocab corpus pass + per-merge iteration cost at sf0.1.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdataingestion_spark.operators import vocab  # noqa: E402
from bigdataingestion_spark.session import get_spark  # noqa: E402
from bigdataingestion_spark.sinks.matview import (  # noqa: E402
    IncrementalTopKView,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable  # noqa: E402

N_ROWS = 8_000_000
N_GROUPS = 20_000
N_FILES = 64


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f} s")
    return out, dt


def bench_topk(spark, work: Path):
    src = TxLogTable(str(work / "src"))
    # group-range-clustered layout: file i holds groups [i*G/F, (i+1)*G/F)
    rows = (
        spark.range(N_ROWS)
        .select(
            F.col("id"),
            (F.col("id") % N_GROUPS).alias("g"),
            (F.col("id") * 7919 % 1_000_003).cast("double").alias("score"),
        )
        .repartitionByRange(N_FILES, "g")
        .sortWithinPartitions("g")
    )
    timed("append 8M rows (64 clustered files)", lambda: src.append(rows))
    src.alter_properties({"cdf.enabled": "true"})
    mv = IncrementalTopKView(
        src, str(work / "mv"), ["g"],
        order_by="score", k=5, payload=["id"], rebuild_ratio=None,
    )
    _, t_build = timed("top-k build (8M rows, 20k groups, k=5)",
                       lambda: mv.build(spark))
    timed("zorder-cluster the view by group (64 KiB files)",
          lambda: mv.view.compact(
              spark, target_file_bytes=64 * 1024, zorder_by=["g"]
          ))
    print(f"  view files after clustering: "
          f"{len(mv.view.snapshot().files)}")

    # insert-only window: 8k rows across 100 groups
    src.append(
        spark.range(8_000).select(
            (F.col("id") + N_ROWS).alias("id"),
            (F.col("id") % 100).alias("g"),
            (F.col("id") * 13 % 999_983).cast("double").alias("score"),
        )
    )
    _, t_fold = timed("insert-only fold refresh (8k-row window)",
                      lambda: mv.refresh(spark))
    assert mv.last_recompute_files is None
    print(f"  view files scanned by the fold: {mv.last_view_files[0]}"
          f"/{mv.last_view_files[1]}")

    # delete window: a contiguous group span (clustered -> few files)
    src.delete(spark, "g >= 100 AND g < 200 AND score > 500000")
    _, t_rec = timed("recompute refresh (delete in 100-group span)",
                     lambda: mv.refresh(spark))
    print(f"  recompute files scanned: {mv.last_recompute_files[0]}"
          f"/{mv.last_recompute_files[1]}")
    _, t_rebuild = timed("full re-build (yardstick)", lambda: mv.build(spark))
    return t_build, t_fold, t_rec, t_rebuild


def bench_bpe(spark, sf_dir: str, n_merges: int = 20):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    vb, t_vocab = timed(
        f"word_vocab corpus pass ({n_docs} docs)",
        lambda: vocab.word_vocab(docs).count(),
    )
    print(f"  distinct words: {vb}")
    t0 = time.time()
    merges = vocab.learn_bpe(docs, n_merges)
    dt = time.time() - t0
    print(f"learn_bpe {len(merges)} merges: {dt:.2f} s "
          f"({dt / max(len(merges), 1):.2f} s/merge, corpus read once)")
    return t_vocab, dt, len(merges)


def main():
    spark = get_spark(
        app_name="bench-topk-bpe", master="local[32]",
        shuffle_partitions=32,
    )
    work = Path(tempfile.mkdtemp(prefix="bench_topk_"))
    try:
        bench_topk(spark, work)
        bench_bpe(spark, "/root/testdata/sf0.1")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
