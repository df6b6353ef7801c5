"""Data selection for LM training via importance resampling (DSIR).

Implements the public DSIR recipe (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling", arXiv:2302.03169): estimate
how target-like each raw document is under two bag-of-hashed-n-gram
unigram models — one fit on the TARGET corpus (the distribution you
want more of), one on the RAW corpus — and resample raw documents with
probability proportional to the importance weight
``p_target(features) / p_raw(features)``. The hashed feature space is
what makes this tractable at web scale: every word 1..n-gram collapses
into one of ``buckets`` integer ids, so both "models" are just
``buckets``-row count tables.

Scale shape (the reason this is a one-liner at 100 TB):

- featurization is explode → hash → ``groupBy(id, bucket).count()`` —
  the shuffle moves ``(id, bucket)`` integers, never n-gram strings
  (the md5 bucket is computed before the exchange);
- each model is a ≤ ``buckets``-row aggregate, broadcast back onto the
  per-document features, so scoring is one map-side join + one keyed
  sum per document;
- resampling is Gumbel-top-k over the scores (``TakeOrderedAndProject``
  — per-partition heaps, no global sort), with the Gumbel noise derived
  from ``md5(id)`` like every other sampling gate in this repo:
  seedless, engine-portable, reshuffle-proof, so the selected set is a
  pure function of the data.

All log-probabilities are Laplace-smoothed
(``(n_b + 1) / (N + buckets)``), matching what the DuckDB oracle
recomputes exactly; weights and scores are rounded to 6 decimals before
any ordering so engine summation-order noise cannot flip a selection.

The reference has no data-selection surface at all (ING covers
ingestion only); this is part of the [EXT] LLM-pipeline tier alongside
dedup.py / similarity.py / text.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdataingestion_spark.caching import cache_tracked as _cache
from bigdataingestion_spark.operators.dedup import spread
from bigdataingestion_spark.operators.text import normalize_text


def _ngram_bag(words: Column, n: int) -> Column:
    """Word n-grams WITH multiplicity (a bag, not a set — DSIR counts
    occurrences; contrast dedup.word_shingles' array_distinct)."""
    n_g = F.size(words) - F.lit(n - 1)
    return F.when(n_g < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_g),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        )
    )


def hashed_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    buckets: int = 10_000,
) -> DataFrame:
    """``(id, bucket, cnt)``: the bag of hashed word 1..``n_max``-grams
    per document — DSIR's feature space. Buckets are
    ``int(md5(gram)[:8], 16) % buckets`` (the repo's standard seedless
    hash gate), computed BEFORE the aggregation exchange so the shuffle
    carries integers, never text. Documents whose normalized text is
    empty produce no rows (``split('')`` would yield ``['']``)."""
    words = (
        spread(df)
        .filter(F.length(normalize_text(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
        )
    )
    grams = words.select(
        F.col(id_col),
        F.explode(
            F.concat(
                *[_ngram_bag(F.col("_w"), n) for n in range(1, n_max + 1)]
            )
        ).alias("_g"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )
    return (
        grams.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bucket_log_probs(
    counts: DataFrame, buckets: int
) -> tuple[DataFrame, float]:
    """Laplace-smoothed unigram model over the hashed-feature space:
    ``lp[b] = ln((n_b + 1) / (N + buckets))``, plus the default
    log-probability of a bucket the corpus never produced.

    The model is COLLECTED to the driver (≤ ``buckets`` rows — bounded
    by construction, never by data size) and rebuilt as a local
    DataFrame: deriving it lazily from ``counts`` would splice the
    whole featurization subtree under the scoring join and re-execute
    the corpus explode once per consumer."""
    rows = (
        counts.groupBy("bucket").agg(F.sum("cnt").alias("_n")).collect()
    )
    total = sum(int(r["_n"]) for r in rows)
    denom = float(total + buckets)
    lp = counts.sparkSession.createDataFrame(
        [
            (int(r["bucket"]), math.log((int(r["_n"]) + 1) / denom))
            for r in rows
        ],
        "bucket bigint, _lp double",
    )
    return lp, -math.log(denom)


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    buckets: int = 10_000,
) -> DataFrame:
    """Per-raw-document DSIR log importance weight
    ``(id, log_weight)``::

        log_weight(d) = sum over d's features b of
                        cnt_d[b] * (ln p_target[b] - ln p_raw[b])

    Positive means the document looks more like the target corpus than
    like the raw corpus. Both model tables are ≤ ``buckets`` rows and
    broadcast; documents with no features (empty normalized text) carry
    weight 0.0 rather than vanishing, so a selection over the result
    still sees the whole corpus. Weights are rounded to 6 decimals
    (engine-portable ordering)."""
    # the raw features feed TWO consumers (the raw model's collect and
    # the scoring probe side); the tracked cache makes the corpus
    # explode run once — the model collect materializes it, scoring
    # reads it back. Target features have one consumer (its model).
    feats = _cache(
        hashed_ngram_counts(raw, text_col, id_col, n_max, buckets)
    )
    t_feats = hashed_ngram_counts(target, text_col, id_col, n_max, buckets)
    return _weights_from_features(raw, feats, t_feats, id_col, buckets)


def dsir_weights_in_corpus(
    raw: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    buckets: int = 10_000,
) -> DataFrame:
    """DSIR weights when the TARGET is a slice of the raw corpus itself
    (the common composed-pipeline shape: "more like my curated subset").
    Mathematically identical to
    ``dsir_importance_weights(raw, raw.filter(is_target))``, but the
    corpus is featurized ONCE: the target model derives from the cached
    feature table by a semi-join on the target ids instead of a second
    explode of the target slice's text — in a dedup → gate → select
    pipeline this halves the featurization work, the dominant cost."""
    feats = _cache(
        hashed_ngram_counts(raw, text_col, id_col, n_max, buckets)
    )
    # ONE model job fits BOTH unigram models (r15): the target is a
    # slice of the corpus, so its per-bucket totals ride the raw
    # model's aggregate as a conditional sum over the flagged ids —
    # one collect instead of two (the old shape re-aggregated the
    # cached features a second time behind a semi-join), per-bucket
    # values identical by construction.
    flagged = feats.join(
        raw.filter(is_target)
        .select(id_col)
        .withColumn("_t", F.lit(1)),
        id_col,
        "left",
    )
    rows = (
        flagged.groupBy("bucket")
        .agg(
            F.sum("cnt").alias("_n"),
            F.sum(F.when(F.col("_t") == 1, F.col("cnt"))).alias("_nt"),
        )
        .collect()
    )
    spark = raw.sparkSession
    total_r = sum(int(r["_n"]) for r in rows)
    total_t = sum(int(r["_nt"]) for r in rows if r["_nt"] is not None)
    denom_r = float(total_r + buckets)
    denom_t = float(total_t + buckets)
    lp_raw = spark.createDataFrame(
        [
            (int(r["bucket"]), math.log((int(r["_n"]) + 1) / denom_r))
            for r in rows
        ],
        "bucket bigint, _lp double",
    )
    lp_tgt = spark.createDataFrame(
        [
            (int(r["bucket"]), math.log((int(r["_nt"]) + 1) / denom_t))
            for r in rows
            if r["_nt"] is not None
        ],
        "bucket bigint, _lp double",
    )
    return _score_with_models(
        raw, feats, lp_raw, -math.log(denom_r),
        lp_tgt, -math.log(denom_t), id_col,
    )


def _weights_from_features(
    raw: DataFrame,
    feats: DataFrame,
    t_feats: DataFrame,
    id_col: str,
    buckets: int,
) -> DataFrame:
    """Shared scoring tail: fit both models, broadcast them onto the
    per-document features, sum per document (see
    :func:`dsir_importance_weights` for the contract)."""
    lp_raw, def_raw = _bucket_log_probs(feats, buckets)
    lp_tgt, def_tgt = _bucket_log_probs(t_feats, buckets)
    return _score_with_models(
        raw, feats, lp_raw, def_raw, lp_tgt, def_tgt, id_col
    )


def _score_with_models(
    raw: DataFrame,
    feats: DataFrame,
    lp_raw: DataFrame,
    def_raw: float,
    lp_tgt: DataFrame,
    def_tgt: float,
    id_col: str,
) -> DataFrame:
    """Scoring tail over ALREADY-FITTED models (local ≤ buckets-row
    frames): broadcast both onto the per-document features, sum per
    document, keep zero-feature documents at weight 0.0."""
    scored = (
        feats
        # every feature bucket exists in lp_raw by construction; target
        # buckets the target corpus never produced fall to the smoothed
        # default — exactly the Laplace model's answer, never a drop
        .join(F.broadcast(lp_tgt.withColumnRenamed("_lp", "_lp_t")),
              "bucket", "left")
        .join(F.broadcast(lp_raw.withColumnRenamed("_lp", "_lp_r")),
              "bucket", "left")
        .select(
            F.col(id_col),
            (
                F.col("cnt")
                * (
                    F.coalesce(F.col("_lp_t"), F.lit(def_tgt))
                    - F.coalesce(F.col("_lp_r"), F.lit(def_raw))
                )
            ).alias("_c"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("_c"), 6).alias("log_weight"))
    )
    return (
        raw.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    buckets: int = 10_000,
) -> DataFrame:
    """Select ``k`` raw documents by Gumbel-top-k over the DSIR log
    weights — sampling WITHOUT replacement with probability proportional
    to the importance weights (the Gumbel-max trick; the paper's
    resampling step), made deterministic by deriving each document's
    Gumbel noise from ``md5(id)`` instead of a RNG::

        u(d)     = (int(md5(id)[:8], 16) % 1e6 + 0.5) / 1e6   in (0, 1)
        score(d) = log_weight(d) + (-ln(-ln(u(d))))

    Returns ``(id, log_weight, score)`` for the top ``k`` by
    ``(score desc, id)``. The top-k executes as TakeOrderedAndProject
    (per-partition heaps + a k-row driver merge), never a global sort;
    determinism makes a 100 TB selection reproducible and auditable —
    rerun it and the same training set falls out."""
    w = dsir_importance_weights(
        raw, target, text_col, id_col, n_max, buckets
    )
    return gumbel_top_k(w, k, id_col)


def dsir_resample_in_corpus(
    raw: DataFrame,
    is_target: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    buckets: int = 10_000,
) -> DataFrame:
    """:func:`dsir_resample` with an in-corpus target slice — one corpus
    featurization (see :func:`dsir_weights_in_corpus`), same
    deterministic Gumbel-top-k selection."""
    w = dsir_weights_in_corpus(
        raw, is_target, text_col, id_col, n_max, buckets
    )
    return gumbel_top_k(w, k, id_col)


def gumbel_top_k(w: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic Gumbel-top-k over a ``(id, log_weight)`` frame (the
    shared selection tail — see :func:`dsir_resample` for the noise
    construction and the TakeOrderedAndProject execution shape)."""
    u = (
        (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 1_000_000
        )
        + 0.5
    ) / 1_000_000.0
    score = F.round(
        F.col("log_weight") - F.log(-F.log(u)), 6
    ).alias("score")
    return (
        w.select(F.col(id_col), F.col("log_weight"), score)
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
