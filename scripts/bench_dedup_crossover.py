"""Measure the exact-Jaccard vs MinHash-LSH(+verify) crossover.

SCALE.md argues the shingle self-join of `ngram_jaccard_pairs` is the part
of near-dup detection that cannot survive corpus growth, and that banded
MinHash-LSH with candidate-bounded exact verification (`lsh_then_exact`)
is the scale path. This script produces the numbers: corpora at 1x/2x/5x/
10x the sf0.1 documents table (replicas perturbed so cross-replica pairs
are near- but not exact duplicates), wall time for both strategies at each
size, pair counts, and the recall of the composition against the exact
join.

Usage: python scripts/bench_dedup_crossover.py [sf_dir]
Prints one JSON line per (multiplier, strategy).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def build_corpus(spark, sf_dir: str, mult: int):
    """mult copies of the documents table; replica k gets doc_id offset and
    a k-specific token injected at the front of the text, so replicas are
    near-dups (high but != 1.0 jaccard) of the original — the workload
    near-dup detection exists for."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = base.count()
    parts = [base]
    for k in range(1, mult):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                F.concat(F.lit(f"replica{k} marker{k} "), F.col("text")).alias(
                    "text"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bigdataingestion_spark.caching import release_caches
    from bigdataingestion_spark.operators import dedup
    from bigdataingestion_spark.session import get_spark

    spark = get_spark(app_name="dedup-crossover")
    for mult in (1, 2, 5, 10):
        corpus = build_corpus(spark, sf_dir, mult).cache()
        n_docs = corpus.count()

        t0 = time.perf_counter()
        exact_pairs = dedup.ngram_jaccard_pairs(corpus, threshold=0.5).count()
        release_caches()
        t_exact = time.perf_counter() - t0

        t0 = time.perf_counter()
        comp_pairs = dedup.lsh_then_exact(
            corpus, threshold=0.5, num_hashes=32, bands=16
        ).count()
        release_caches()
        t_comp = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "mult": mult,
                    "docs": n_docs,
                    "exact_sec": round(t_exact, 2),
                    "lsh_verify_sec": round(t_comp, 2),
                    "exact_pairs": exact_pairs,
                    "lsh_verify_pairs": comp_pairs,
                    "recall": round(comp_pairs / exact_pairs, 4)
                    if exact_pairs
                    else None,
                    "speedup": round(t_exact / t_comp, 2),
                }
            ),
            flush=True,
        )
        corpus.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
