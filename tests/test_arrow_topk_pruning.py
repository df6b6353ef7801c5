"""Arrow cosine top-k: mid-stream pruning must not drop true top-k rows
(regression for the 2D-argsort pruning bug — only triggers when a partition
holds > 4k rows)."""

from __future__ import annotations

from bigdataingestion_spark.operators.similarity import cosine_topk, cosine_topk_arrow


def test_arrow_topk_with_pruning_matches_exact(spark):
    # 400 vectors in ONE partition with k=3 -> pruning triggers many times
    import math

    rows = [
        (i, [math.cos(i / 100.0), math.sin(i / 100.0), float(i % 7)])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).coalesce(1)
    q = [1.0, 0.05, 3.0]
    exact = [(r.vec_id, r.cosine_sim) for r in cosine_topk(df, q, k=3).collect()]
    arrow = [(r.vec_id, r.cosine_sim) for r in cosine_topk_arrow(df, q, k=3).collect()]
    assert arrow == exact
