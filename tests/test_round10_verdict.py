"""Round-10 verdict items (VERDICT r9 "Next round"):

2. ``semantic_dedup_incremental`` gains a cached-corpus entry point —
   precomputed centroids + corpus assignments make a batch admission
   cost O(batch + touched-cell members) instead of a per-batch
   quantizer retrain + full-corpus re-assign. The cached path must
   admit the IDENTICAL set (both inputs are deterministic pure
   functions of the corpus).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataingestion_spark.functions.io import load_table
from bigdataingestion_spark.operators import similarity


def _admitted(df):
    return sorted((r["vec_id"], r["cell_id"]) for r in df.collect())


def test_semantic_dedup_incremental_cached_path_is_identical(
    spark, sf_correct_dir
):
    """The cached-corpus path (precomputed centroids + corpus
    assignments) admits exactly the set the self-computing path does —
    on the same corpus/batch split the gate query uses."""
    emb = load_table(spark, sf_correct_dir, "embeddings")
    cut = emb.agg(F.max("vec_id")).first()[0] // 2
    corpus = emb.filter(F.col("vec_id") < cut)
    batch = emb.filter(F.col("vec_id") >= cut)
    uncached = similarity.semantic_dedup_incremental(
        corpus, batch, n_cells=4, threshold=0.3
    )
    cents = similarity.kmeans_lite_centroids(corpus, 4)
    assigns = similarity.ivf_assign(corpus.select("vec_id", "embedding"), cents)
    cached = similarity.semantic_dedup_incremental(
        corpus,
        batch,
        n_cells=4,
        threshold=0.3,
        centroids=cents,
        corpus_assignments=assigns,
    )
    assert _admitted(cached) == _admitted(uncached)
    assert len(_admitted(cached)) > 0


def test_semantic_dedup_incremental_touched_cell_pruning(spark):
    """Corpus vectors in cells the batch never lands in are irrelevant
    by construction (pairs require equal cell_id); the pruned plan must
    still drop a batch vector duplicating a corpus vector in a SHARED
    cell and admit the rest."""
    corpus_rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    batch_rows = [
        (10, [0.999, 0.01, 0.0]),  # near-dup of corpus id=1
        (11, [0.57, 0.57, 0.59]),  # no near neighbor
    ]
    corpus = spark.createDataFrame(corpus_rows, ["vec_id", "embedding"])
    batch = spark.createDataFrame(batch_rows, ["vec_id", "embedding"])
    cents = similarity.kmeans_lite_centroids(corpus, 3)
    assigns = similarity.ivf_assign(corpus.select("vec_id", "embedding"), cents)
    out = similarity.semantic_dedup_incremental(
        corpus,
        batch,
        threshold=0.95,
        centroids=cents,
        corpus_assignments=assigns,
    )
    assert sorted(r["vec_id"] for r in out.collect()) == [11]


def test_semantic_dedup_incremental_cached_skips_corpus_quantizer_work(
    spark,
):
    """Structural guarantee of the cached path's cost claim: with both
    cache inputs provided, neither quantizer training nor corpus
    re-assignment is invoked (the per-batch full-corpus passes the r9
    verdict flagged)."""
    import unittest.mock as mock

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    batch = spark.createDataFrame([(10, [0.7, 0.7])], ["vec_id", "embedding"])
    cents = similarity.kmeans_lite_centroids(corpus, 2)
    assigns = similarity.ivf_assign(corpus.select("vec_id", "embedding"), cents)
    with mock.patch.object(
        similarity,
        "kmeans_lite_centroids",
        side_effect=AssertionError("cached path must not retrain"),
    ):
        with mock.patch.object(
            similarity, "ivf_assign", wraps=similarity.ivf_assign
        ) as assign_spy:
            out = similarity.semantic_dedup_incremental(
                corpus,
                batch,
                threshold=0.95,
                centroids=cents,
                corpus_assignments=assigns,
            )
            out.collect()
    # two assignment calls: the batch's, and the exactness guard over
    # the cache's UNCOVERED corpus rows — which must be EMPTY here (a
    # complete cache means the corpus is never re-assigned)
    assert assign_spy.call_count == 2
    counts = sorted(c.args[0].count() for c in assign_spy.call_args_list)
    assert counts == [0, batch.count()]
