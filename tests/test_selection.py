"""DSIR data selection (operators/selection.py, arXiv:2302.03169).

What the tests pin: the importance weights discriminate target-like
text from off-distribution text, empty documents survive with weight 0,
the whole pipeline is deterministic under repartitioning (seedless
md5-derived features and noise), and resampling is exact Gumbel-top-k
over the weights (verified against an independent recomputation).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.operators import selection


@pytest.fixture(scope="module")
def corpora(spark):
    """A raw corpus of two dialects plus a target corpus of one of
    them: 'aaaish' docs should out-weigh 'zzzish' docs."""
    raw_rows = []
    for i in range(40):
        raw_rows.append((i, f"alpha beta gamma delta token{i % 5}"))
    for i in range(40, 80):
        raw_rows.append((i, f"zulu yankee xray whisky code{i % 5}"))
    raw_rows.append((999, "   .,!   "))  # normalizes to empty
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    target = spark.createDataFrame(
        [(1000 + i, f"alpha beta gamma delta token{i % 5}") for i in range(20)],
        ["doc_id", "text"],
    )
    return raw, target


def test_weights_discriminate_target_dialect(spark, corpora):
    raw, target = corpora
    w = selection.dsir_importance_weights(raw, target)
    rows = {r["doc_id"]: r["log_weight"] for r in w.collect()}
    assert len(rows) == 81  # every raw doc scored, including the empty one
    alpha = [rows[i] for i in range(40)]
    zulu = [rows[i] for i in range(40, 80)]
    # DSIR's promise is RELATIVE: target-dialect docs strictly out-weigh
    # off-distribution docs. Absolute signs are not promised — with
    # Laplace smoothing over 10k buckets and a raw corpus that itself
    # contains the target dialect, a target-like doc's weight can sit
    # below zero while still dominating every off-distribution doc.
    assert min(alpha) > max(zulu)
    assert min(alpha) - max(zulu) > 1.0  # separated by a wide margin


def test_empty_document_keeps_zero_weight(spark, corpora):
    raw, target = corpora
    w = selection.dsir_importance_weights(raw, target)
    assert w.filter(F.col("doc_id") == 999).first()["log_weight"] == 0.0


def test_weights_invariant_under_repartition(spark, corpora):
    raw, target = corpora
    a = selection.dsir_importance_weights(raw, target)
    b = selection.dsir_importance_weights(raw.repartition(7), target)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_resample_is_exact_gumbel_topk(spark, corpora):
    """The selected set equals an independent recomputation of
    score = log_weight + Gumbel(md5(id)) taken top-k — no RNG, no
    partition dependence."""
    raw, target = corpora
    k = 25
    got = [
        (r["doc_id"], r["log_weight"], r["score"])
        for r in selection.dsir_resample(raw, target, k=k).collect()
    ]
    assert len(got) == k
    w = {
        r["doc_id"]: r["log_weight"]
        for r in selection.dsir_importance_weights(raw, target).collect()
    }

    def gumbel(doc_id):
        u = (int(__import__("hashlib").md5(
            str(doc_id).encode()).hexdigest()[:8], 16) % 1_000_000 + 0.5
        ) / 1_000_000.0
        return -math.log(-math.log(u))

    expect = sorted(
        ((i, lw, round(lw + gumbel(i), 6)) for i, lw in w.items()),
        key=lambda t: (-t[2], t[0]),
    )[:k]
    assert sorted(got, key=lambda t: (-t[2], t[0])) == expect


def test_resample_favors_heavy_weights(spark, corpora):
    """With strongly separated weights, the selection should be
    dominated by the target dialect (the point of importance
    resampling)."""
    raw, target = corpora
    picked = {
        r["doc_id"]
        for r in selection.dsir_resample(raw, target, k=30).collect()
    }
    n_alpha = sum(1 for i in picked if i < 40)
    assert n_alpha >= 25  # 40 alpha docs vs 41 others; weights dominate


def test_hashed_ngram_counts_bag_semantics(spark):
    """Counts are a BAG (multiplicity preserved), unigrams + bigrams,
    and bucket values stay within range."""
    df = spark.createDataFrame([(1, "a b a b a")], ["doc_id", "text"])
    out = selection.hashed_ngram_counts(df, buckets=50)
    rows = out.collect()
    # 5 unigrams + 4 bigrams = 9 occurrences, across <= 4 distinct
    # grams ('a', 'b', 'a b', 'b a') -> <= 4 buckets (modulo collisions)
    assert sum(r["cnt"] for r in rows) == 9
    assert all(0 <= r["bucket"] < 50 for r in rows)


def test_resample_plan_uses_topk_not_global_sort(spark, corpora):
    raw, target = corpora
    plan = selection.dsir_resample(raw, target, k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_in_corpus_variant_equals_two_frame_variant(spark):
    """dsir_weights_in_corpus / dsir_resample_in_corpus (r11): the
    shared-featurization in-corpus path must be EXACTLY the two-frame
    path with target = raw.filter(pred) — same weights, same selection —
    while featurizing the corpus once (the target model derives from the
    cached features by semi-join, not a second explode)."""
    rows = [
        (
            i,
            "en" if i % 3 == 0 else "de",
            (
                f"the quick brown fox jumps over token{i % 5} "
                if i % 3 == 0
                else f"der schnelle braune fuchs springt wort{i % 5} "
            )
            * (1 + i % 4),
        )
        for i in range(1, 61)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    pred = F.col("lang") == "en"
    a = selection.dsir_importance_weights(docs, docs.filter(pred))
    b = selection.dsir_weights_in_corpus(docs, pred)
    da = {r["doc_id"]: r["log_weight"] for r in a.collect()}
    db = {r["doc_id"]: r["log_weight"] for r in b.collect()}
    assert da == db
    sa = [(r["doc_id"], r["score"])
          for r in selection.dsir_resample(docs, docs.filter(pred), 10).collect()]
    sb = [(r["doc_id"], r["score"])
          for r in selection.dsir_resample_in_corpus(docs, pred, 10).collect()]
    assert sa == sb
    # the selection favors the target slice: en docs dominate the top-k
    en = sum(1 for d, _ in sb if d % 3 == 0)
    assert en >= 6


def test_in_corpus_path_featurizes_once(spark, monkeypatch):
    """The composed-pipeline claim (r11): dsir_weights_in_corpus
    featurizes the corpus EXACTLY once — the target model derives from
    the cached features by semi-join — where the two-frame path
    featurizes twice (raw + target). The cache is what makes the single
    featurization shared across the model collect and the scoring probe
    (plan strings can't show this — InMemoryTableScan inlines its cached
    plan — so the proof is at the construction seam)."""
    calls = []
    orig = selection.hashed_ngram_counts

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(selection, "hashed_ngram_counts", counting)
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", f"word{i} alpha beta")
         for i in range(20)],
        "doc_id long, lang string, text string",
    )
    selection.dsir_weights_in_corpus(docs, F.col("lang") == "en").collect()
    assert len(calls) == 1
    calls.clear()
    selection.dsir_importance_weights(
        docs, docs.filter(F.col("lang") == "en")
    ).collect()
    assert len(calls) == 2
