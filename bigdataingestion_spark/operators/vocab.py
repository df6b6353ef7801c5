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


def _select_batch(
    rows, probe: int, min_freq: int, limit: int
) -> list[tuple[str, str]]:
    """The longest PROVABLY sequential-equivalent prefix of the sorted
    pair list: selecting pairs in (freq DESC, lhs, rhs) order is
    identical to running the argmax one merge at a time as long as

    1. selected pairs are pairwise SYMBOL-DISJOINT — merging (a, b)
       only changes counts of pairs touching ``a`` or ``b`` (pairs
       ``(x,a)`` lose the occurrences now glued, ``(b,y)`` likewise;
       nothing else moves), so every later selected pair's count is
       exactly what the sorted list says;
    2. each selected pair's count strictly exceeds the running CAP on
       any pair a previous selection could have CREATED — a merge of
       (a, b) creates pairs ``(x, ab)`` with count ≤ count(x, a) and
       ``(ab, y)`` with count ≤ count(b, y), both read off the same
       sorted list (and bounded by the probe tail for pairs below it);
    3. the scan STOPS at the first pair sharing a symbol with a
       selection — its post-merge count is unknown (it may not have
       decreased at all), so it could still be the true argmax.

    Strict ``>`` against the cap sidesteps tie-break ambiguity with
    created pairs; ties among selected pairs resolve in sort order,
    which IS the sequential tie-break. Pure driver-side selection over
    an already-collected bounded list.

    Conditions 1–2 additionally assume each CREATED token string
    (``lhs + rhs``) is FRESH — it does not alias a symbol some OTHER
    pair already uses. An aliased symbol's pair counts could INCREASE
    mid-batch (created occurrences pool with pre-existing ones), which
    the decrease-only cap argument cannot bound — e.g. selecting
    ('a','b') while the window also holds ('ab','z'): after the merge,
    ('ab','z')'s true count may exceed a later selection's. The guard:
    a selected pair whose created string appears as ANY window symbol
    ends the batch right after its own (still-valid: conditions 1–2
    were checked against pre-batch counts the merge cannot have
    touched) commitment — the same stop shape as condition 3, so
    progress of ≥1 merge per pass is preserved. An alias to a symbol
    OUTSIDE the probe window is not window-detectable; there the
    derivation argument carries it: a symbol equal to ``lhs + rhs``
    must itself have been produced by an (lhs, rhs)-boundary merge,
    which would have consumed the adjacencies the current pair is
    counted from. The same stop fires when a SECOND selection creates
    a token an earlier one already did (two decompositions of one
    token, e.g. ('a','bc') and ('ab','c') → 'abc'): their created
    pairs pool, exceeding the single-creation cap bound."""
    if not rows:
        return []
    tailmax = rows[-1]["pair_freq"] if len(rows) == probe else 0
    max_by_lhs: dict[str, int] = {}
    max_by_rhs: dict[str, int] = {}
    for r in rows:  # sorted desc: first sighting is that symbol's max
        max_by_lhs.setdefault(r["lhs"], r["pair_freq"])
        max_by_rhs.setdefault(r["rhs"], r["pair_freq"])
    window_syms = set(max_by_lhs) | set(max_by_rhs)
    used: set[str] = set()
    created: set[str] = set()
    cap = tailmax
    out: list[tuple[str, str]] = []
    for r in rows:
        f, a, b = r["pair_freq"], r["lhs"], r["rhs"]
        if (
            len(out) >= limit
            or f < min_freq
            or f <= cap
            or a in used
            or b in used
        ):
            break
        out.append((a, b))
        tok = a + b
        if tok in window_syms or tok in created:
            # the created token aliases a live window symbol, or a
            # SECOND selection created the same token (two
            # decompositions can POOL their created-pair counts past
            # the single-creation cap bound) — stop the batch after
            # this (still-valid) commitment
            break
        created.add(tok)
        used.update((a, b))
        cap = max(cap, max_by_rhs.get(a, 0), max_by_lhs.get(b, 0))
    return out


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 2,
    batch: int = 16,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns them
    in application order. Stops early when the best remaining pair's
    frequency drops below ``min_freq``.

    Deterministic across partitionings and engines: the argmax
    tie-breaks by (pair_freq DESC, lhs ASC, rhs ASC) — a total order —
    and runs as a bounded TakeOrdered collect, never a driver-side
    scan. Each iteration touches only the vocabulary frame; the corpus
    is read exactly once by :func:`word_vocab`.

    ``batch`` bounds how many merges one Spark pass may commit: the
    naive loop costs one pair-count job PER MERGE (32k merges = 32k
    driver round-trips — the scheduling floor, not the data, dominates
    at real vocabulary sizes), so each pass collects a bounded sorted
    pair window and takes the longest prefix :func:`_select_batch` can
    PROVE equals the one-at-a-time argmax sequence — the merge list is
    bit-identical for every ``batch`` value, only the job count
    changes. ``batch=1`` recovers the single-merge loop."""
    return learn_bpe_from_word_vocab(
        word_vocab(df, text_col),
        n_merges,
        min_freq=min_freq,
        batch=batch,
    )


def learn_bpe_from_word_vocab(
    word_freq: DataFrame,
    n_merges: int,
    min_freq: int = 2,
    batch: int = 16,
) -> list[tuple[str, str]]:
    """:func:`learn_bpe` starting from an ALREADY-MATERIALIZED
    ``(word, freq)`` vocabulary frame — the common big-data shape: the
    one corpus pass is expensive at 100 TB, so compute the word
    vocabulary once, persist it, and learn (or re-learn with different
    merge counts / min_freq) from the persisted table without touching
    the corpus again. Identical semantics and determinism contract."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if min_freq < 1:
        raise ValueError(f"min_freq must be >= 1, got {min_freq}")
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    probe = max(256, 16 * batch)
    vocab = (
        word_freq
        .withColumn("syms", _symbolize(F.col("word")))
        .select("syms", "freq")
        .localCheckpoint()  # vocab is the loop's working set; drop the
        # corpus lineage so no iteration can re-trigger the corpus scan
    )
    merges: list[tuple[str, str]] = []
    try:
        while len(merges) < n_merges:
            rows = (
                pair_counts(vocab)
                .orderBy(
                    F.desc("pair_freq"), F.asc("lhs"), F.asc("rhs")
                )
                .limit(probe)
                .collect()
            )
            if not rows or rows[0]["pair_freq"] < min_freq:
                break
            selected = _select_batch(
                rows, probe, min_freq, min(batch, n_merges - len(merges))
            )
            if not selected:
                # the provable window is empty (e.g. the best pair is
                # (x, x), whose own merge caps everything): fall back to
                # the plain single-argmax step for this pass
                selected = [(rows[0]["lhs"], rows[0]["rhs"])]
            merges.extend(selected)
            # one vocabulary rewrite applies the whole batch: the folds
            # chain UNCONDITIONALLY in selection order (= sequential
            # application order; each fold references its input exactly
            # once, so the expression grows linearly in the batch size —
            # per-merge when/otherwise guards would double references at
            # every level). One word-level guard on the ORIGINAL symbols
            # skips the whole chain for untouched words: any merge that
            # could apply — directly, or to a token an earlier merge in
            # this batch CREATED — requires some selected pair's symbols
            # to be present up front
            orig = F.col("syms")
            col = orig
            any_present = None
            for lhs, rhs in selected:
                col = _merge_pass(col, lhs, rhs)
                has = F.arrays_overlap(
                    orig, F.array(F.lit(lhs))
                ) & F.arrays_overlap(orig, F.array(F.lit(rhs)))
                any_present = (
                    has if any_present is None else (any_present | has)
                )
            nxt = vocab.withColumn(
                "syms", F.when(any_present, col).otherwise(orig)
            ).localCheckpoint()
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
