"""Measure apply_bpe ENCODE throughput at a production-scale merge
table (VERDICT r12 item 6).

The fixture corpus's vocabulary SATURATES early (learn_bpe stops when
no pair repeats — the synthetic documents fully merge into whole words
at ~100 merges), so an 8k-merge table cannot be LEARNED from it. The
encoder's cost model doesn't need one: per word it scans adjacent
pairs against a broadcast dict (`p in ranks` membership tests), so the
wall is a function of text shape and word-cache hit rate, NOT of
|ranks| — the only |ranks|-proportional cost is the closure broadcast
(8k pairs ≈ a few hundred KB). This script PINS that claim: encode the
sf0.1 documents with (a) the real learned table and (b) the same
table padded to 8192 entries with never-firing pairs (symbols the
normalizer cannot emit), 3 reps each, and report both walls. Equal
walls = merge-table size does not bind the encoder at vocabulary
scale.

Usage: python scripts/bench_bpe_encode.py [pad_to] [encode_sf_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _measure(docs, merges, reps=3):
    from pyspark.sql import functions as F

    from bigdataingestion_spark.operators import vocab

    walls = []
    toks = None
    for _ in range(reps + 1):  # first rep warms, then measured reps
        agg = vocab.apply_bpe(docs, merges).select(
            F.sum(F.size("bpe_tokens")).alias("toks")
        )
        t0 = time.time()
        toks = agg.collect()[0]["toks"]
        walls.append(time.time() - t0)
    return int(toks), round(statistics.median(walls[1:]), 3)


def main() -> int:
    pad_to = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    learn_dir = "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from bigdataingestion_spark.functions import load_table
    from bigdataingestion_spark.operators import vocab
    from bigdataingestion_spark.session import get_spark

    spark = get_spark(app_name="bpe-encode-bench")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    merges = vocab.learn_bpe(
        load_table(spark, learn_dir, "documents"), pad_to, min_freq=1
    )
    learn_sec = round(time.time() - t0, 1)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    chars = int(docs.select(F.sum(F.length("text"))).first()[0])

    # pad with pairs the encoder can never see: '§' survives no
    # [^a-z0-9] normalization, so these ranks are pure table ballast
    padded = list(merges) + [
        ("§", f"x{i}") for i in range(pad_to - len(merges))
    ]
    toks_real, wall_real = _measure(docs, merges)
    toks_pad, wall_pad = _measure(docs, padded)
    assert toks_real == toks_pad, "ballast ranks must never fire"

    out = {
        "metric": "bpe_encode",
        "learn_sf": learn_dir,
        "merges_learned": len(merges),
        "learn_sec": learn_sec,
        "encode_sf": sf_dir,
        "docs": n_docs,
        "chars": chars,
        "tokens": toks_real,
        "wall_real_table_sec": wall_real,
        "wall_padded_8k_table_sec": wall_pad,
        "padded_table_entries": len(padded),
        "tokens_per_sec_real": int(toks_real / wall_real),
        "tokens_per_sec_padded": int(toks_pad / wall_pad),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
