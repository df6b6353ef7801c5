"""Distributed subword-vocabulary learning (byte-pair encoding).

BPE (Sennrich, Haddow & Birch 2016, arXiv:1508.07909 — public
literature) learns a tokenizer vocabulary by repeatedly merging the
most frequent adjacent symbol pair. The naive formulation re-scans the
corpus per merge; the distributed shape here does the corpus-dependent
work EXACTLY ONCE:

1. ``word_vocab`` — one normalize→explode→groupBy pass over the corpus
   (the only full-corpus shuffle). Everything after runs on the word
   VOCABULARY, bounded by distinct-word count (Heaps' law keeps this in
   the low millions even at 100 TB of text), cached in memory.
2. ``learn_bpe`` — per merge: one pair-count aggregation over the
   vocabulary (map-side combined, ~|alphabet|² keys), one bounded
   ``limit(1)`` collect for the argmax (deterministic tie-break), and
   one JVM-side fold (``F.aggregate``; no Python UDF anywhere in the
   loop) rewriting only the words that contain the pair. Lineage is
   truncated with ``localCheckpoint`` so a 32k-merge run doesn't grow
   the plan unboundedly.
3. ``apply_bpe`` — encoding is embarrassingly parallel; the learned
   merge ranks broadcast to an Arrow-batched pandas UDF that greedily
   merges the lowest-rank pair per word (the standard encoder loop).

The word→symbols convention is Sennrich's: characters plus a trailing
end-of-word marker ``</w>``, so merges can distinguish suffixes from
prefixes of longer words.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text

EOW = "</w>"


def word_vocab(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over the normalized corpus — the ONE corpus pass.

    Normalization matches :func:`operators.text.normalize_text`
    (lowercase, non-alphanumeric runs collapsed to single spaces), so
    words are ``[a-z0-9]+`` and every downstream symbol is one
    character until merges start gluing them.
    """
    words = df.select(
        F.explode(
            F.split(normalize_text(F.col(text_col)), " ")
        ).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _symbolize(word: Column) -> Column:
    """Initial symbol sequence: characters + the end-of-word marker."""
    return F.concat(F.split(word, ""), F.array(F.lit(EOW)))


def pair_counts(vocab: DataFrame, syms_col: str = "syms") -> DataFrame:
    """(lhs, rhs, pair_freq): adjacent-symbol pair frequencies over the
    vocabulary, each pair weighted by its word's corpus frequency.
    Words of one symbol contribute nothing. Map-side combinable — the
    shuffle carries ~|current alphabet|² keys, not the vocabulary."""
    pairs = F.expr(
        f"transform(sequence(1, size({syms_col}) - 1), "
        f"i -> struct({syms_col}[i - 1] AS lhs, {syms_col}[i] AS rhs))"
    )
    return (
        vocab.filter(F.size(syms_col) >= 2)
        .select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Initial (character-level) adjacent-pair frequencies of the
    corpus: the statistic BPE's first merge maximizes, as one
    oracle-checkable DataFrame (word_vocab → symbolize → pair_counts)."""
    vocab = word_vocab(df, text_col).withColumn(
        "syms", _symbolize(F.col("word"))
    )
    return pair_counts(vocab)


def _merge_pass(syms: Column, lhs: str, rhs: str) -> Column:
    """One left-to-right, non-overlapping merge pass: every adjacent
    (lhs, rhs) becomes the glued symbol; a symbol consumed by a merge
    can't start another in the same pass (``aaa`` under (a,a) →
    ``[aa, a]``). A JVM-side fold over the symbol array — values are
    passed as literal Columns, never interpolated into SQL text."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc: Column, s: Column) -> Column:
        return (
            F.when(
                acc["carry"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("carry")),
            )
            .when(
                (acc["carry"] == F.lit(lhs)) & (s == F.lit(rhs)),
                F.struct(
                    F.array_append(acc["out"], F.lit(lhs + rhs)).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.array_append(acc["out"], acc["carry"]).alias("out"),
                    s.alias("carry"),
                )
            )
        )

    def fin(acc: Column) -> Column:
        return F.when(acc["carry"].isNull(), acc["out"]).otherwise(
            F.array_append(acc["out"], acc["carry"])
        )

    return F.aggregate(syms, init, step, fin)


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns them
    in application order. Stops early when the best remaining pair's
    frequency drops below ``min_freq``.

    Deterministic across partitionings and engines: the argmax
    tie-breaks by (pair_freq DESC, lhs ASC, rhs ASC) — a total order —
    and runs as a bounded ``limit(1)`` collect (TakeOrdered), never a
    driver-side scan. Each iteration touches only the vocabulary frame;
    the corpus is read exactly once by :func:`word_vocab`.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if min_freq < 1:
        raise ValueError(f"min_freq must be >= 1, got {min_freq}")
    vocab = (
        word_vocab(df, text_col)
        .withColumn("syms", _symbolize(F.col("word")))
        .select("syms", "freq")
        .localCheckpoint()  # vocab is the loop's working set; drop the
        # corpus lineage so no iteration can re-trigger the corpus scan
    )
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            best = (
                pair_counts(vocab)
                .orderBy(
                    F.desc("pair_freq"), F.asc("lhs"), F.asc("rhs")
                )
                .limit(1)
                .collect()
            )
            if not best or best[0]["pair_freq"] < min_freq:
                break
            lhs, rhs = best[0]["lhs"], best[0]["rhs"]
            merges.append((lhs, rhs))
            has_pair = F.arrays_overlap(
                F.col("syms"), F.array(F.lit(lhs))
            ) & F.arrays_overlap(F.col("syms"), F.array(F.lit(rhs)))
            nxt = vocab.withColumn(
                "syms",
                F.when(
                    has_pair, _merge_pass(F.col("syms"), lhs, rhs)
                ).otherwise(F.col("syms")),
            ).localCheckpoint()  # truncate per-iteration lineage
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with learned merges: per word, greedily
    merge the LOWEST-RANK adjacent pair until none applies (the standard
    BPE encoder; equivalent to replaying the merges in order). Encoding
    is row-local, so it runs as an Arrow-batched pandas UDF with the
    rank table broadcast in the closure — the vectorized-Python seam,
    kept out of the learn loop on purpose."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        if word in cache:
            return cache[word]
        syms = [*word, EOW]
        while len(syms) >= 2:
            pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
            ranked = [
                (ranks[p], i) for i, p in enumerate(pairs) if p in ranks
            ]
            if not ranked:
                break
            _, at = min(ranked)
            syms[at: at + 2] = [syms[at] + syms[at + 1]]
        cache[word] = syms
        return syms

    @F.pandas_udf(ArrayType(StringType()))
    def encode(texts):
        import re

        cache: dict = {}
        out = []
        for t in texts:
            norm = re.sub(r"[^a-z0-9]+", " ", (t or "").lower()).strip()
            toks: list[str] = []
            for w in norm.split(" "):
                if w:
                    toks.extend(encode_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))
