"""Model-based test for join-view IVM (r11): random interleavings of
fact DML, dimension DML, and maintenance calls must leave the view
EQUAL to a from-scratch aggregation of the current fact⋈dim join —
across the additive path, the insert-only fold, the affected-group
recompute (max is in the aggregate set), group-key migration through
refresh_dimensions, and maintenance batching (several ops folded by one
refresh). The oracle is recomputed independently per step from the live
tables."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.matview import (
    DimJoin,
    IncrementalJoinAggView,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable

_uniq = itertools.count()


def _oracle(spark, fact, dim):
    j = (
        fact.read(spark)
        .join(dim.read(spark), F.col("k") == F.col("k_id"))
        .groupBy("gname")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.max("v").alias("mx"),
        )
    )
    return {
        r["gname"]: (r["n"], round(r["s"], 6), r["mx"]) for r in j.collect()
    }


def _view_rows(spark, mv):
    return {
        r["gname"]: (r["n"], round(r["s"], 6), r["mx"])
        for r in mv.read(spark).collect()
    }


@given(data=st.data())
@settings(
    max_examples=8,
    deadline=None,
    # tmp_path is function-scoped but reused across examples; every
    # example isolates itself in a unique subdir below, so the reuse is
    # intentional, not a leak between examples
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_dml_and_maintenance_matches_oracle(spark, tmp_path, data):
    base = tmp_path / f"ex{next(_uniq)}"
    fact = TxLogTable(str(base / "fact"))
    fact.append(
        spark.createDataFrame(
            [(i, i % 8, float(i)) for i in range(1, 25)],  # k=7 unmatched
            "id long, k long, v double",
        )
    )
    fact.alter_properties({"cdf.enabled": "true"})
    dim = TxLogTable(str(base / "dim"))
    dim.append(
        spark.createDataFrame(
            [(k, f"G{k % 3}") for k in range(7)], "k_id long, gname string"
        )
    )
    dim.alter_properties({"cdf.enabled": "true"})
    mv = IncrementalJoinAggView(
        fact,
        str(base / "mv"),
        ["gname"],
        {"n": ("count", "1"), "s": ("sum", "v"), "mx": ("max", "v")},
        dims=[DimJoin(dim, on=[("k", "k_id")], select=["gname"])],
        rebuild_ratio=None,  # pin the incremental machinery under test
    )
    mv.build(spark)
    next_id = 1000
    n_ops = data.draw(st.integers(2, 5), label="n_ops")
    for step in range(n_ops):
        op = data.draw(st.integers(0, 5), label=f"op{step}")
        if op == 0:  # append matched + unmatched fact rows
            k = data.draw(st.integers(0, 8), label=f"k{step}")
            fact.append(
                spark.createDataFrame(
                    [(next_id, k, float(next_id % 97))],
                    "id long, k long, v double",
                )
            )
            next_id += 1
        elif op == 1:  # update a fact slice (moves sums and maxima)
            m = data.draw(st.integers(2, 5), label=f"m{step}")
            fact.update(spark, f"id % {m} = 0", {"v": "v + 10"})
        elif op == 2:  # delete a fact slice (recompute trigger)
            m = data.draw(st.integers(2, 6), label=f"d{step}")
            fact.delete(spark, f"id % {m} = 1")
        elif op == 3:  # dim group migration (group-key change)
            k = data.draw(st.integers(0, 6), label=f"mk{step}")
            g = data.draw(st.integers(0, 3), label=f"mg{step}")
            dim.update(spark, f"k_id = {k}", {"gname": f"'G{g}'"})
        elif op == 4:  # dim delete: that key's fact rows vanish
            k = data.draw(st.integers(0, 6), label=f"dk{step}")
            dim.delete(spark, f"k_id = {k}")
        else:  # dim append: an unmatched fact key becomes visible
            dim.append(
                spark.createDataFrame(
                    [(7, "G0")], "k_id long, gname string"
                )
            )
        if data.draw(st.booleans(), label=f"maint{step}"):
            mv.refresh_dimensions(spark)
            mv.refresh(spark)
            assert _view_rows(spark, mv) == _oracle(spark, fact, dim)
    mv.refresh_dimensions(spark)
    mv.refresh(spark)
    assert _view_rows(spark, mv) == _oracle(spark, fact, dim)
