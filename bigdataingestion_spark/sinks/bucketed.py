"""Bucketed tables for co-located (exchange-free) joins.

At 100 TB the repeated join ``fact JOIN dim ON key`` pays a full shuffle of
the fact side every run. Writing both sides bucketed by the join key
(``bucketBy(N, key) + sortBy(key)``) pre-co-locates matching keys in the same
bucket files; Spark's sort-merge join then runs with NO Exchange on either
side (plan shows ``SortMergeJoin`` directly over the scans).

Bucketing requires the session catalog (``saveAsTable``), not path writes —
bucket metadata lives in the table definition. The bucket count should be
sized so ``table_size / buckets ≈ 128-512 MB``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a bucketed+sorted catalog table."""
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key with the same bucket count —
    executes shuffle-free (no Exchange in the plan).

    The ``merge`` hint pins sort-merge join: at bench scale the planner would
    otherwise broadcast a small side (marking the scans 'Bucketed: false');
    the co-located SMJ is the shape that matters at 100 TB, where neither
    side broadcasts."""
    return spark.table(left_table).join(
        spark.table(right_table).hint("merge"), on=on, how=how
    )


def is_exchange_free(df: DataFrame) -> bool:
    """True if the physical plan contains no shuffle Exchange — the assertion
    tests use to prove co-location worked."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
