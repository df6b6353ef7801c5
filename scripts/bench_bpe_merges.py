"""Measure the BPE merge-loop floor at a REAL vocabulary size (r12).

``learn_bpe`` costs one bounded Spark pass per COMMITTED BATCH of
merges; the r11 open question was whether the one-job-per-merge floor
(driver round-trips, not data) is material at realistic merge counts —
the documents fixture cannot answer it (31 distinct words), so this
script builds a deterministic Zipf-weighted synthetic word vocabulary
(JVM-side, seeded by construction: word i is the base-26 encoding of a
Knuth-hashed index, freq ~ N/rank) and drives
``learn_bpe_from_word_vocab`` — the same entry a 100 TB corpus uses
after its one corpus pass — with the provably-equivalent batched
selection (batch=16, the default) and the single-merge loop (batch=1).
Merge sequences are asserted identical; prints one JSON line for the
SCALE.md row.

    BPE_WORDS=200000 BPE_MERGES=1000 python scripts/bench_bpe_merges.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bigdataingestion_spark.operators import vocab as V
from bigdataingestion_spark.session import get_spark


def _zipf_word_vocab(spark, n_words: int):
    """(word, freq): word = base-26 letters of a Knuth multiplicative
    hash (length 3-9, uniform alphabet), freq = Zipf N/rank — all
    built from spark.range, deterministic across runs and engines."""
    h = (F.col("id") * F.lit(2654435761)) % F.lit(2**31)
    length = (F.col("id") % 7 + 3).cast("int")
    word = F.expr(
        "concat_ws('', transform(sequence(1, len), "
        "i -> char(97 + pmod(cast(h / pow(26, i - 1) as bigint) "
        "+ id * i, 26))))"
    )
    return (
        spark.range(n_words)
        .withColumn("h", h)
        .withColumn("len", length)
        .withColumn("word", word)
        .withColumn(
            "freq", (F.lit(n_words) / (F.col("id") + 1)).cast("long") + 1
        )
        # hash collisions would double-count a word; last groupBy wins
        .groupBy("word")
        .agg(F.max("freq").alias("freq"))
    )


def main() -> None:
    n_words = int(os.environ.get("BPE_WORDS", "200000"))
    n = int(os.environ.get("BPE_MERGES", "1000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench-bpe-merges",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    wv = _zipf_word_vocab(spark, n_words).persist()
    out = {
        "distinct_words": wv.count(),
        "merges_requested": n,
    }
    results = {}
    for b in (16, 1):
        t0 = time.perf_counter()
        merges = V.learn_bpe_from_word_vocab(wv, n, min_freq=1, batch=b)
        dt = time.perf_counter() - t0
        results[b] = merges
        out[f"batch{b}_sec"] = round(dt, 2)
        out[f"batch{b}_merges"] = len(merges)
        out[f"batch{b}_per_merge_ms"] = round(
            1000 * dt / max(1, len(merges)), 1
        )
    assert results[16] == results[1], "batched != sequential merge list"
    out["equivalent"] = True
    out["speedup"] = round(out["batch1_sec"] / out["batch16_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
