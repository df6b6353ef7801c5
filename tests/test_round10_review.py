"""Round-10 mid-round adversarial review regressions (six findings over
the r10 diff ``1cf9d14..HEAD``):

1. (high) UPDATE SET on a BY DEFAULT identity column could silently
   commit NULL identity values — the mark-advance path skipped NULL
   extremes and nothing rejected a NULL assignment or a failed cast.
2. (high) ``_prop_drift_reason`` compared only base-vs-cur ENDPOINT
   properties, so an intermediate hwm rewind masked by a later advance
   reconciled instead of conflicting — a reserve-mode data commit could
   land duplicate identity values after a rewind + re-reservation.
3. ``semantic_dedup_incremental``'s cached path silently EXCLUDED any
   corpus vector absent from ``corpus_assignments`` from the dedup
   compare (inner join), diverging from the self-computing path for
   survivors-only or stale caches; uncovered vectors are now assigned
   on the fly under the frozen centroids.
4. COVERAGE.md's r9 gate-rotation record reconstructed a 48-query
   window (doc fix, no test).
5. Dead ``rewound`` dict in test_round10_advice (test hygiene, no test).
6. The step-direction mark-advance fold lived in two hand-written
   copies (_fill_identity_nulls commit mode vs _reserve_identity_ranges)
   ~100 lines apart; now one shared helper serves both.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from bigdataingestion_spark.operators import similarity
from bigdataingestion_spark.sinks.txlog import (
    ConcurrentWriteError,
    IdentityColumnViolationError,
    TxLogTable,
)


def _ids(t, spark, col="id"):
    return sorted(r[col] for r in t.read(spark).select(col).collect())


# ------------------- 1. UPDATE SET NULL into a BY DEFAULT identity --


def test_update_set_null_identity_raises(spark, tmp_path):
    """Review finding 1 repro: SET id = NULL must raise, not commit
    NULL identity values (append's contract fills NULL slots; UPDATE
    refuses to create them)."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id", always=False)
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    with pytest.raises(IdentityColumnViolationError, match="NULL"):
        t.update(spark, "v = 'a'", {"id": "NULL"})
    # nothing committed: table unchanged, no NULL ids
    assert _ids(t, spark) == [1, 2]


def test_update_set_failed_cast_identity_raises(spark, tmp_path):
    """A failed cast that quietly yields NULL (try_cast under ANSI; a
    bare cast in non-ANSI deployments) is the sneaky variant of the
    same hole and must raise identically."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id", always=False)
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    with pytest.raises(IdentityColumnViolationError, match="NULL"):
        t.update(spark, "v = 'a'", {"id": "try_cast('abc' AS BIGINT)"})
    assert _ids(t, spark) == [1, 2]


def test_update_set_case_null_branch_identity_raises(spark, tmp_path):
    """A CASE expression with a NULL branch that fires on any matched
    row must also raise."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id", always=False)
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    with pytest.raises(IdentityColumnViolationError, match="NULL"):
        t.update(
            spark,
            "id >= 1",
            {"id": "CASE WHEN v = 'a' THEN 100 ELSE NULL END"},
        )
    assert _ids(t, spark) == [1, 2]


def test_update_set_valid_identity_still_works(spark, tmp_path):
    """The guard must not break legitimate BY DEFAULT reassignment:
    non-NULL values commit and the mark still advances past them."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id", always=False)
    t.append(spark.createDataFrame([("a",), ("b",)], ["v"]))
    t.update(spark, "v = 'a'", {"id": "100"})
    assert _ids(t, spark) == [2, 100]
    assert t.snapshot().properties["identity.hwm.id"] == "100"
    t.append(spark.createDataFrame([("c",)], ["v"]))
    assert _ids(t, spark) == [2, 100, 101]


# --------------- 2. per-winner property-transition drift checking --


def test_intermediate_hwm_rewind_conflicts_despite_masking_advance(
    spark, tmp_path
):
    """Review finding 2 repro: base mark 3 -> rewind to 1 -> re-advance
    to 3. Endpoints are identical, but ids 2..3 were re-issuable in
    between, so a delta-free op based before the rewind must CONFLICT
    (per-transition walk), not silently reconcile (endpoint compare)."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    t.append(spark.createDataFrame([("a",), ("b",), ("c",)], ["v"]))
    base = t.snapshot()
    assert base.properties["identity.hwm.id"] == "3"
    t.alter_properties({"identity.hwm.id": "1"})  # the masked rewind
    t.alter_properties({"identity.hwm.id": "3"})  # re-advance: endpoints equal
    schema = StructType.fromJson(json.loads(base.schema_json))
    with pytest.raises(ConcurrentWriteError, match="against its"):
        t._commit_reconciled([], [], schema, "delete", None, base)


def test_reserve_rewind_rereserve_duplicate_ids_blocked(spark, tmp_path):
    """The finding's full reserve-mode shape: writer A reserves a range,
    an operator rewinds the mark, a second reservation re-issues the
    SAME range — A's data commit (based on its own reservation) must
    now conflict instead of landing duplicate ids."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    t.alter_properties({"identity.allocation.mode": "reserve"})
    t.append(spark.createDataFrame([("seed",)], ["v"]))  # mark -> 1
    # writer A: reserve ids 2..3 (metadata commit), data commit pending
    needs = {
        "id": {
            "spec": {"start": 1, "step": 1, "always": True},
            "col": "id",
            "per_part": {0: 2},
            "acc": 2,
            "n_null": 2,
            "sup_extreme": None,
        }
    }
    starts = t._reserve_identity_ranges(needs)
    assert starts == {"id": 2}
    base_a = t.snapshot()  # A's base: its own reservation (mark 3)
    # operator rewind + writer B re-reserving the same range
    t.alter_properties({"identity.hwm.id": "1"})
    assert t._reserve_identity_ranges(needs) == {"id": 2}  # B gets 2..3 too
    cur = t.snapshot()
    assert cur.properties["identity.hwm.id"] == "3"  # endpoint == A's base
    # A's delta-free data commit must NOT reconcile over the rewind
    schema = StructType.fromJson(json.loads(base_a.schema_json))
    with pytest.raises(ConcurrentWriteError, match="against its"):
        t._commit_reconciled([], [], schema, "append", None, base_a)


def test_unrelated_property_flip_flop_conflicts(spark, tmp_path):
    """A non-identity property changed and reverted between base and
    cur also conflicts under the transition walk — intentionally
    stricter than the endpoint compare (the op's caller may have
    observed the intermediate state)."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], ["id", "v"]))
    base = t.snapshot()
    t.alter_properties({"some.knob": "on"})
    t.alter_properties({"some.knob": None})  # revert: endpoints equal
    schema = StructType.fromJson(json.loads(base.schema_json))
    with pytest.raises(ConcurrentWriteError, match="properties changed"):
        t._commit_reconciled([], [], schema, "delete", None, base)


def test_pure_mark_advance_still_reconciles(spark, tmp_path):
    """The walk must not over-conflict: a winner sequence of pure
    step-direction advances (the reserve-mode happy path) stays
    reconcilable for delta-free ops."""
    t = TxLogTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([], "id bigint, v string"))
    t.add_identity_column(spark, "id")
    t.alter_properties({"identity.allocation.mode": "reserve"})
    t.append(spark.createDataFrame([("a",)], ["v"]))
    base = t.snapshot()
    t.append(spark.createDataFrame([("b",)], ["v"]))  # reserve + data
    t.append(spark.createDataFrame([("c",)], ["v"]))  # reserve + data
    schema = StructType.fromJson(json.loads(base.schema_json))
    v = t._commit_reconciled([], [], schema, "delete", None, base)
    assert v == t.snapshot().version


# ---------------- 3. cached SemDeDup exactness for partial caches --


def _admitted(df):
    return sorted((r["vec_id"], r["cell_id"]) for r in df.collect())


def test_semantic_dedup_incremental_survivor_cache_is_exact(spark):
    """Review finding 3 repro: a batch vector near-duplicating a
    DROPPED corpus vector (not its surviving representative) must still
    be dropped when the cache holds only full SemDeDup's survivors —
    the uncovered corpus vectors are assigned on the fly, never
    silently excluded."""
    corpus_rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.02, 0.0]),  # near-dup of 1: SemDeDup drops it
        (3, [0.0, 1.0, 0.0]),
    ]
    batch_rows = [
        # closer to DROPPED 2 than to survivor 1; cosine to 2 above a
        # threshold its cosine to 1 misses
        (10, [0.999, 0.021, 0.0]),
        (11, [0.0, 0.0, 1.0]),  # no neighbor: admitted
    ]
    corpus = spark.createDataFrame(corpus_rows, ["vec_id", "embedding"])
    batch = spark.createDataFrame(batch_rows, ["vec_id", "embedding"])
    cents = similarity.kmeans_lite_centroids(corpus, 2)
    survivors = similarity.semantic_dedup(corpus, n_cells=2, threshold=0.999)
    assert sorted(r["vec_id"] for r in survivors.collect()) == [1, 3]
    uncached = similarity.semantic_dedup_incremental(
        corpus, batch, n_cells=2, threshold=0.9995
    )
    cached = similarity.semantic_dedup_incremental(
        corpus,
        batch,
        n_cells=2,
        threshold=0.9995,
        centroids=cents,
        corpus_assignments=survivors,  # covers 1,3 — NOT dropped 2
    )
    assert _admitted(cached) == _admitted(uncached)
    assert sorted(r["vec_id"] for r in cached.collect()) == [11]


def test_semantic_dedup_incremental_stale_cache_is_exact(spark, sf_correct_dir):
    """A cache lagging recent ingests (covers only half the corpus)
    admits the identical set to the self-computing path."""
    from bigdataingestion_spark.functions.io import load_table

    emb = load_table(spark, sf_correct_dir, "embeddings")
    hi = emb.agg(F.max("vec_id")).first()[0]
    cut = hi // 2
    corpus = emb.filter(F.col("vec_id") < cut)
    batch = emb.filter(F.col("vec_id") >= cut)
    cents = similarity.kmeans_lite_centroids(corpus, 4)
    stale = similarity.ivf_assign(
        corpus.filter(F.col("vec_id") < cut // 2).select(
            "vec_id", "embedding"
        ),
        cents,
    )
    uncached = similarity.semantic_dedup_incremental(
        corpus, batch, n_cells=4, threshold=0.3
    )
    cached = similarity.semantic_dedup_incremental(
        corpus,
        batch,
        n_cells=4,
        threshold=0.3,
        centroids=cents,
        corpus_assignments=stale,
    )
    assert _admitted(cached) == _admitted(uncached)


# --------------------------- 6. shared mark-advance fold helper --


def test_identity_mark_advance_fold():
    """One table of (hwm, step, nxt, acc, n_null, sup_extreme) cases
    pins the shared fold both allocation modes now call."""
    fold = TxLogTable._identity_mark_advance
    # allocation only, ascending: mark = last allocated slot
    assert fold(None, 1, 1, 3, 3, None) == 3
    assert fold("3", 1, 4, 2, 2, None) == 5
    # no NULLs, no supplied values: mark unchanged
    assert fold("3", 1, 4, 2, 0, None) == 3
    assert fold(None, 1, 1, 2, 0, None) is None
    # supplied extreme beyond the allocated range wins
    assert fold("3", 1, 4, 2, 2, 100) == 100
    # supplied extreme below the mark: mark holds
    assert fold("3", 1, 4, 0, 0, 2) == 3
    # descending columns fold with min semantics
    assert fold("-3", -1, -4, 2, 2, None) == -5
    assert fold("-3", -1, -4, 2, 2, -100) == -100
    assert fold("-3", -1, -4, 0, 0, -1) == -3


# ================== second (late) review pass over 45cc6c4..HEAD ==


def test_semantic_dedup_cache_complete_skips_guard(spark):
    """Second-pass finding: the exactness guard's anti-join is
    corpus-proportional per batch; a transactionally maintained FULL
    cache can assert cache_complete=True and skip it — exactly ONE
    ivf_assign call (the batch's), identical admissions."""
    import unittest.mock as mock

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    batch = spark.createDataFrame([(10, [0.7, 0.7])], ["vec_id", "embedding"])
    cents = similarity.kmeans_lite_centroids(corpus, 2)
    assigns = similarity.ivf_assign(corpus.select("vec_id", "embedding"), cents)
    guarded = similarity.semantic_dedup_incremental(
        corpus, batch, threshold=0.95,
        centroids=cents, corpus_assignments=assigns,
    )
    with mock.patch.object(
        similarity, "ivf_assign", wraps=similarity.ivf_assign
    ) as spy:
        fast = similarity.semantic_dedup_incremental(
            corpus, batch, threshold=0.95,
            centroids=cents, corpus_assignments=assigns,
            cache_complete=True,
        )
        rows_fast = sorted(map(tuple, fast.collect()))
    assert spy.call_count == 1  # the batch's assignment only
    assert rows_fast == sorted(map(tuple, guarded.collect()))


def test_dsir_weights_with_empty_target_corpus(spark):
    """Second-pass finding repro (oracle side had NULL-poisoned totals):
    an EMPTY target corpus means the uniform smoothed model — weights
    stay finite and equal to sum(cnt * (ln(1/B) - lp_raw)), never
    NULL/zeroed-out."""
    from bigdataingestion_spark.operators import selection

    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha alpha alpha")],
        ["doc_id", "text"],
    )
    target = raw.filter("doc_id < 0")  # empty
    w = {
        r["doc_id"]: r["log_weight"]
        for r in selection.dsir_importance_weights(raw, target).collect()
    }
    assert len(w) == 2
    assert all(v is not None and v < 0 for v in w.values())
    # the repetitive doc concentrates mass in fewer raw buckets, so its
    # raw log-prob is higher and its weight strictly lower
    assert w[2] < w[1]


def test_matview_null_key_refused_on_refresh_too(spark, tmp_path):
    """The NULL-key refusal moved from a dedicated source/CDF scan to a
    probe on the aggregated frames — it must still fire on REFRESH when
    NULL keys arrive after a clean build."""
    from bigdataingestion_spark.sinks.matview import IncrementalAggView

    src = TxLogTable(str(tmp_path / "src"))
    src.append(
        spark.createDataFrame(
            [(1, "g0", 1.0)], "id long, grp string, val double"
        )
    )
    src.alter_properties({"cdf.enabled": "true"})
    mv = IncrementalAggView(
        src, str(tmp_path / "mv"), ["grp"], {"n": ("count", "1")}
    )
    mv.build(spark)
    src.append(
        spark.createDataFrame(
            [(2, None, 2.0)], "id long, grp string, val double"
        )
    )
    with pytest.raises(ValueError, match="NULL group key"):
        mv.refresh(spark)
