"""Approximate aggregates stay within tolerance of exact values.

events_approx_stats now carries its own deterministic-bounds contract
(the query emits booleans asserting each sketch landed within tolerance,
and the oracle pins them TRUE) — the test checks every bound holds and
that the exact distinct count matches an independent computation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataingestion_spark.catalog import events_approx_stats
from bigdataingestion_spark.functions.io import load_table


def test_approx_stats_bounds_hold(spark, sf_correct_dir):
    rows = {r.event_type: r for r in events_approx_stats(spark, sf_correct_dir).collect()}
    ev = load_table(spark, sf_correct_dir, "events")
    exact = {
        r.event_type: r.users
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    assert rows.keys() == exact.keys()
    for et, r in rows.items():
        assert r.n_users == exact[et]
        assert r.hll_ok and r.p50_ok and r.p99_ok, f"sketch out of bounds for {et}: {r}"
