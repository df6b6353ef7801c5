"""[EXT] Iterative graph algorithms composed from DataFrame joins.

Spark ships no DataFrame-native PageRank (GraphX is RDD/Scala-only), but
power iteration IS a join-aggregate pipeline: each step joins the edge list
with the current rank vector on ``src``, scales by out-weight, and sums
contributions per ``dst``. Expressing it declaratively keeps every step in
whole-stage codegen and lets AQE pick the join strategy per iteration —
broadcast while the rank vector is small, shuffle hash join on a
billion-node graph. The edge list (with per-source strengths) is cached
once and reused across iterations; the iteration count is small and fixed,
so lineage stays shallow — no checkpointing needed, unlike the unbounded
fixpoint in ``dedup.connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdataingestion_spark.caching import cache_tracked


def cooccurrence_edges(
    pairs: DataFrame,
    key_col: str = "p",
    node_col: str = "s",
    max_key_degree: int | None = 100,
) -> DataFrame:
    """Weighted co-occurrence edge list from (key, node) membership rows:
    every ordered (src, dst) node pair sharing a key, weighted by the
    number of distinct shared keys.

    The per-key self-join is quadratic in nodes-per-key: one hot key with
    1e5 members would alone emit 1e10 pairs. Keys with more than
    ``max_key_degree`` members are therefore dropped from the join — the
    same hot-key df-cap as ``dedup.ngram_jaccard_pairs`` applies to hot
    shingles (a key shared by everyone carries no co-occurrence signal).
    The count() window is keyed on ``key_col``, and its shuffle leaves the
    data hash-partitioned by key, which the self-join immediately reuses.
    ``max_key_degree=None`` disables the cap (inputs known to be cold).
    """
    from pyspark.sql.window import Window

    sp = pairs.select(F.col(key_col).alias("_k"), F.col(node_col).alias("_n"))
    if max_key_degree is not None:
        hot = Window.partitionBy("_k")
        sp = (
            sp.withColumn("_deg", F.count(F.lit(1)).over(hot))
            .filter(F.col("_deg") <= F.lit(max_key_degree))
            .drop("_deg")
        )
    a, b = sp.alias("a"), sp.alias("b")
    return (
        a.join(b, (F.col("a._k") == F.col("b._k")) & (F.col("a._n") != F.col("b._n")))
        .groupBy(F.col("a._n").alias("src"), F.col("b._n").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    weight: str | None = None,
) -> DataFrame:
    """Fixed-iteration (weighted) PageRank without dangling-mass
    redistribution.

    ``edges``: directed (``src``, ``dst``[, ``weight``]) rows — supply both
    directions for an undirected graph. ``nodes``: single ``node`` column
    defining the population N (isolated nodes decay to ``(1-d)/N``). Each
    step a node passes ``damping * pr * w/strength`` along every out-edge,
    where ``strength`` is its total out-weight (uniform weights reduce to
    classic PageRank). Returns (``node``, ``pr``).
    """
    n = nodes.count()  # one scalar aggregate, driver-side by design
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("pr"))
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    ew = edges.select("src", "dst", w_col.alias("_w"))
    strength = ew.groupBy("src").agg(F.sum("_w").alias("_strength"))
    # tracked cache, NOT cache()+unpersist-on-return: the result is lazy, so
    # unpersisting before the caller materializes it would silently rebuild
    # the edge list once per iteration; release_caches() frees it post-query
    ew = cache_tracked(ew.join(strength, "src"))
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(iterations):
        contribs = (
            ew.join(ranks, ew["src"] == ranks["node"])
            .select(
                F.col("dst"),
                (F.col("pr") * F.col("_w") / F.col("_strength")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(contribs, nodes["node"] == contribs["dst"], "left").select(
            "node",
            (
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("pr"),
        )
    return ranks
