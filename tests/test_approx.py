"""Approximate aggregates stay within tolerance of exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataingestion_spark.catalog import events_approx_stats
from bigdataingestion_spark.functions.io import load_table


def test_approx_stats_tolerance(spark, sf_correct_dir):
    approx = {r.event_type: r for r in events_approx_stats(spark, sf_correct_dir).collect()}
    ev = load_table(spark, sf_correct_dir, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for et in exact:
        assert abs(approx[et].approx_users - exact[et].users) <= max(
            2, 0.05 * exact[et].users
        )
        assert abs(approx[et].approx_p50 - exact[et].p50) <= 0.05 * abs(exact[et].p50) + 1
        assert abs(approx[et].approx_p99 - exact[et].p99) <= 0.05 * abs(exact[et].p99) + 1
