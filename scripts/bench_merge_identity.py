"""Reproducible measurements for the round-9/10 subsystems at sf0.1:
conditional-merge pruning (narrow batch vs 16-file table, PLUS the r10
worst-case arm whose source hits every file — zero pruning), identity
allocation throughput vs a plain append (commit and reserve modes),
SemDeDup within-cell vs all-pairs crossover, incremental SemDeDup
cached-quantizer vs self-computing admission, and duplicate_spans. The
numbers recorded in SCALE.md came from this script; re-run after any
change to merge(), _fill_identity_nulls, ivf_assign, or
semantic_dedup_incremental:

    PYTHONPATH=. python scripts/bench_merge_identity.py
"""
import sys, time, os, tempfile
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from bigdataingestion_spark.session import get_spark
from bigdataingestion_spark.functions.io import load_table
from pyspark.sql import functions as F

spark = get_spark()
SF = "/root/testdata/sf0.1"

def t0(label, fn):
    s = time.time(); r = fn(); d = time.time() - s
    print(f"{label}: {d:.2f}s {r if r is not None else ''}", flush=True)
    return d

li = load_table(spark, SF, "lineitem").select("l_orderkey","l_partkey","l_quantity","l_extendedprice")
n_li = li.count(); print("lineitem rows:", n_li)

# --- identity allocation throughput -----------------------------------
from bigdataingestion_spark.sinks.txlog import TxLogTable
d = tempfile.mkdtemp()
t_plain = TxLogTable(os.path.join(d, "plain"))
t0("append plain (baseline)", lambda: t_plain.append(li))
t_id = TxLogTable(os.path.join(d, "ident"))
t_id.append(spark.createDataFrame([], "rid bigint, l_orderkey bigint, l_partkey bigint, l_quantity double, l_extendedprice double"))
t_id.add_identity_column(spark, "rid")
t0("append with identity allocation", lambda: t_id.append(li))
out = t_id.read(spark).agg(F.countDistinct("rid"), F.count(F.lit(1))).first()
print("identity distinct/total:", out)

# --- conditional merge pruning ----------------------------------------
orders = load_table(spark, SF, "orders").select("o_orderkey","o_orderstatus","o_totalprice")
t_m = TxLogTable(os.path.join(d, "m"))
# 16 single-file commits with disjoint key ranges (sorted repartitionByRange)
keys = orders.select(F.min("o_orderkey"), F.max("o_orderkey")).first()
lo, hi = keys
spanw = (hi - lo) // 16 + 1
for i in range(16):
    part = orders.filter((F.col("o_orderkey") >= lo + i*spanw) & (F.col("o_orderkey") < lo + (i+1)*spanw))
    t_m.append(part.coalesce(1))
print("files:", len(t_m.snapshot().files))
from bigdataingestion_spark.sinks.merge_clauses import (
    when_matched_update, when_not_matched_insert)
src = orders.filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < lo + spanw // 2)).select("o_orderkey", (F.col("o_totalprice")*1.1).alias("p"))
print("src rows:", src.count())
t0("conditional merge (narrow batch)", lambda: t_m.merge(
    spark, src, ["o_orderkey"],
    [when_matched_update(set={"o_totalprice": "s.p"}), when_not_matched_insert(values={"o_orderkey":"s.o_orderkey","o_orderstatus":"'N'","o_totalprice":"s.p"})],
))
print("merge metrics:", t_m.history()[-1]["op_metrics"])

# --- conditional merge WORST CASE: source keys hit every file ----------
# (r10: the 100 TB story must state both bounds — 15/16 pruned above is
# the narrow-feed best case; a wide feed sampled across the whole key
# range prunes NOTHING and rewrites all 16 files)
t_w = TxLogTable(os.path.join(d, "w"))
for i in range(16):
    part = orders.filter((F.col("o_orderkey") >= lo + i*spanw) & (F.col("o_orderkey") < lo + (i+1)*spanw))
    t_w.append(part.coalesce(1))
wide_src = orders.filter(F.col("o_orderkey") % 100 == 0).select(
    "o_orderkey", (F.col("o_totalprice")*1.1).alias("p"))
print("wide src rows:", wide_src.count())
t0("conditional merge (wide batch, zero pruning)", lambda: t_w.merge(
    spark, wide_src, ["o_orderkey"],
    [when_matched_update(set={"o_totalprice": "s.p"}), when_not_matched_insert(values={"o_orderkey":"s.o_orderkey","o_orderstatus":"'N'","o_totalprice":"s.p"})],
))
print("wide merge metrics:", t_w.history()[-1]["op_metrics"])

# --- identity allocation, reserve mode ---------------------------------
t_rv = TxLogTable(os.path.join(d, "ident_rv"))
t_rv.append(spark.createDataFrame([], "rid bigint, l_orderkey bigint, l_partkey bigint, l_quantity double, l_extendedprice double"))
t_rv.add_identity_column(spark, "rid")
t_rv.alter_properties({"identity.allocation.mode": "reserve"})
t0("append with identity allocation (reserve mode)", lambda: t_rv.append(li))
out = t_rv.read(spark).agg(F.countDistinct("rid"), F.count(F.lit(1))).first()
print("reserve identity distinct/total:", out)

# --- SemDeDup: within-cell vs all-pairs -------------------------------
from bigdataingestion_spark.operators import similarity, text
emb = load_table(spark, SF, "embeddings")
print("embeddings:", emb.count())
t0("semantic_dedup n_cells=8", lambda: similarity.semantic_dedup(emb, n_cells=8, threshold=0.3).count())
t0("semantic_dedup n_cells=1 (all-pairs)", lambda: similarity.semantic_dedup(emb, n_cells=1, threshold=0.3).count())

# --- incremental SemDeDup: cached quantizer vs self-computing ---------
# (r10: the cached-corpus entry point makes a batch admission pay only
# batch-side assignment + touched-cell joins; the corpus-proportional
# quantizer retrain and full-corpus re-assign happen once, offline.)
# The corpus is inflated 50x (100k vectors, fresh ids) so the
# corpus-proportional passes DOMINATE the self-computing path and
# their disappearance is visible; the batch stays small (200), the
# steady-state ingest shape.
n_emb = emb.count()
corpus = (
    emb.crossJoin(spark.range(50).select(F.col("id").alias("_rep")))
    .select((F.col("vec_id") + F.col("_rep") * n_emb * 10).alias("vec_id"),
            "embedding")
)
corpus = corpus.persist()
# batch: 200 NEGATED vectors (cosine -1 to every corpus twin -> the
# admission decision is real, not all-drop), ids above the corpus range
batch = emb.filter(F.col("vec_id") >= emb.agg(F.expr("percentile(vec_id, 0.9)")).first()[0]).select(
    (F.col("vec_id") + 1000 * n_emb * 10).alias("vec_id"),
    F.expr("transform(embedding, x -> -x)").alias("embedding"))
print("incremental corpus/batch:", corpus.count(), batch.count())
# n_cells=64: the production shape (the paper scales clusters with the
# corpus; more cells = smaller within-cell joins and a LARGER
# corpus-assignment cost for the self-computing path to re-pay)
t0("semdedup incremental (self-computing)", lambda: similarity.semantic_dedup_incremental(
    corpus, batch, n_cells=64, threshold=0.95).count())
cents = similarity.kmeans_lite_centroids(corpus, 64)
assigns = similarity.ivf_assign(corpus.select("vec_id","embedding"), cents)
cents.persist().count(); assigns.persist().count()  # the offline cache
t0("semdedup incremental (cached quantizer+assignments)", lambda: similarity.semantic_dedup_incremental(
    corpus, batch, n_cells=64, threshold=0.95,
    centroids=cents, corpus_assignments=assigns).count())

# --- duplicate_spans ---------------------------------------------------
docs = load_table(spark, SF, "documents")
print("documents:", docs.count())
t0("duplicate_spans 40/10", lambda: text.duplicate_spans(docs).count())
