"""Distributed BPE (operators/vocab.py) vs a from-first-principles
single-process reference: identical merge lists, identical encodings.

The reference below is written against Sennrich et al.'s algorithm
description directly (dict-of-tuples corpus, Counter pair stats) so the
two implementations share NO code — agreement pins the distributed
fold/argmax, not a mirrored bug.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.operators import vocab

EOW = vocab.EOW


# ----------------------------------------------------------- reference --
def _ref_vocab(texts):
    words = Counter()
    for t in texts:
        norm = re.sub(r"[^a-z0-9]+", " ", (t or "").lower()).strip()
        for w in norm.split(" "):
            if w:
                words[w] += 1
    return {tuple([*w, EOW]): c for w, c in words.items()}

def _ref_pair_counts(v):
    pairs = Counter()
    for syms, c in v.items():
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += c
    return pairs

def _ref_merge(v, pair):
    lhs, rhs = pair
    out = {}
    for syms, c in v.items():
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                merged.append(lhs + rhs)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + c
    return out

def _ref_learn(texts, n_merges, min_freq=2):
    v = _ref_vocab(texts)
    merges = []
    for _ in range(n_merges):
        pairs = _ref_pair_counts(v)
        if not pairs:
            break
        # same total order as the distributed argmax
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        merges.append(best[0])
        v = _ref_merge(v, best[0])
    return merges

def _ref_encode(text, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    out = []
    norm = re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip()
    for w in norm.split(" "):
        if not w:
            continue
        syms = [*w, EOW]
        while len(syms) >= 2:
            cands = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cands:
                break
            _, i = min(cands)
            syms[i: i + 2] = [syms[i] + syms[i + 1]]
        out.extend(syms)
    return out


# --------------------------------------------------------------- tests --
TEXTS = [
    "the lower the newer, the wider the newest",
    "low lower lowest; new newer newest",
    "wide wider widest --- low low low",
    "Null and spice: 42 times lower!",
    None,
    "",
    "aaa aaaa aa a",  # overlapping-merge torture: (a,a) passes
]


def test_learn_bpe_matches_reference_on_synthetic(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = vocab.learn_bpe(df, 25, min_freq=2)
    want = _ref_learn(TEXTS, 25, min_freq=2)
    assert got == want
    assert len(got) > 5  # the corpus supports a real merge sequence


def test_learn_bpe_matches_reference_on_fixture(spark, sf_smoke_dir):
    docs = spark.read.parquet(f"{sf_smoke_dir}/documents.parquet")
    sample = docs.orderBy("doc_id").limit(40)
    texts = [r["text"] for r in sample.select("text").collect()]
    got = vocab.learn_bpe(sample, 15)
    want = _ref_learn(texts, 15)
    assert got == want


def test_min_freq_stops_early(spark):
    df = spark.createDataFrame(
        [("ab ab cd",)], "text string"
    )
    # 'ab' appears twice -> (a,b) and (b,</w>) have freq 2; everything
    # after drops under min_freq=3
    assert vocab.learn_bpe(df, 10, min_freq=3) == []
    got = vocab.learn_bpe(df, 10, min_freq=2)
    assert got == _ref_learn(["ab ab cd"], 10, min_freq=2)


def test_merge_pass_nonoverlapping(spark):
    """'aaa' under merge (a,a) -> [aa, a]: a consumed symbol can't
    start another merge in the same pass."""
    df = spark.createDataFrame([("aaa aaaa",)], "text string")
    got = vocab.learn_bpe(df, 3, min_freq=1)
    assert got == _ref_learn(["aaa aaaa"], 3, min_freq=1)


def test_apply_bpe_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = vocab.learn_bpe(df, 20)
    enc = vocab.apply_bpe(df, merges).select("text", "bpe_tokens").collect()
    for r in enc:
        assert list(r["bpe_tokens"]) == _ref_encode(r["text"], merges)


def test_apply_bpe_roundtrip_reconstructs_text(spark):
    """Detokenizing (strip </w> -> spaces) reproduces the normalized
    text: BPE is lossless over its normalization."""
    df = spark.createDataFrame([(t,) for t in TEXTS if t], "text string")
    merges = vocab.learn_bpe(df, 12)
    rows = vocab.apply_bpe(df, merges).select("text", "bpe_tokens").collect()
    for r in rows:
        norm = re.sub(r"[^a-z0-9]+", " ", r["text"].lower()).strip()
        joined = "".join(r["bpe_tokens"]).replace(EOW, " ").rstrip()
        assert joined == norm


def test_pair_counts_weighted_by_word_freq(spark):
    df = spark.createDataFrame([("go go go stop",)], "text string")
    pc = {
        (r["lhs"], r["rhs"]): r["pair_freq"]
        for r in vocab.bpe_pair_counts(df).collect()
    }
    assert pc[("g", "o")] == 3
    assert pc[("o", EOW)] == 3
    assert pc[("s", "t")] == 1


def test_bad_params_rejected(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="n_merges"):
        vocab.learn_bpe(df, -1)
    with pytest.raises(ValueError, match="min_freq"):
        vocab.learn_bpe(df, 1, min_freq=0)


def test_learn_is_partitioning_invariant(spark):
    """Same merges at 1 partition and 7 partitions: the argmax total
    order, not partition luck, decides ties."""
    rows = [(t,) for t in TEXTS * 3]
    a = vocab.learn_bpe(
        spark.createDataFrame(rows, "text string").coalesce(1), 12
    )
    b = vocab.learn_bpe(
        spark.createDataFrame(rows, "text string").repartition(7), 12
    )
    assert a == b


def test_batched_merges_equal_single_merge_path(spark):
    """The PROVABLY-equivalent batch selection (r12): identical merge
    lists at every batch size, on a tie-heavy corpus and on text with
    created-token/self-pair hazards — batching changes only the Spark
    job count, never the sequence."""
    rows = [(t,) for t in TEXTS * 2] + [
        ("abab abab cabd abd",),  # created token 'ab' feeds later pairs
        ("xxxx yy xxxx yy zz",),  # self-pairs (x,x): batch caps at 1
    ]
    df = spark.createDataFrame(rows, "text string")
    base = vocab.learn_bpe(df, 20, min_freq=1, batch=1)
    for b in (2, 4, 16, 64):
        assert vocab.learn_bpe(df, 20, min_freq=1, batch=b) == base


def test_batched_merges_match_reference_random_corpus(spark):
    """Seeded random words: the batched learner still equals the
    from-first-principles single-process reference end to end."""
    import random

    rng = random.Random(1234)
    alpha = "abcdef"
    texts = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
            for _ in range(30)
        )
        for _ in range(20)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = vocab.learn_bpe(df, 30, min_freq=2, batch=16)
    assert got == _ref_learn(texts, 30, min_freq=2)


def test_batch_param_validated(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="batch"):
        vocab.learn_bpe(df, 1, batch=0)
