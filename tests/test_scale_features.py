"""Skew salting, bucketed co-located joins, idempotent partitioned writes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.operators import skew
from bigdataingestion_spark.sinks.bucketed import (
    cobucketed_join,
    is_exchange_free,
    write_bucketed,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' carries 90% of rows
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    return hot.union(cold)


def test_salted_count_matches_direct(spark, skewed):
    direct = {r.k: r.cnt for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r.k: r.cnt for r in skew.salted_count(skewed, ["k"]).collect()}
    assert salted == direct


def test_salted_sum_matches_direct(spark, skewed):
    direct = {r.k: r.total for r in skewed.groupBy("k").agg(F.sum("v").alias("total")).collect()}
    salted = {r.k: r.total for r in skew.salted_sum(skewed, ["k"], "v").collect()}
    assert salted == direct


def test_salted_join_matches_direct(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("c1", "C1"), ("c2", "C2")], ["k", "label"]
    )
    direct = skewed.join(dim, "k").groupBy("k").count()
    salted = skew.salted_join_small(skewed, dim, on="k", buckets=8).groupBy("k").count()
    assert {tuple(r) for r in direct.collect()} == {tuple(r) for r in salted.collect()}


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    fact = spark.range(10_000).select(
        (F.col("id") % 500).alias("key"), (F.col("id") * 2).alias("val")
    )
    dim = spark.range(500).select(
        F.col("id").alias("key"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    write_bucketed(fact, "fact_b", "key", num_buckets=8)
    write_bucketed(dim, "dim_b", "key", num_buckets=8)
    joined = cobucketed_join(spark, "fact_b", "dim_b", on="key")
    assert joined.count() == 10_000
    assert is_exchange_free(joined), "co-bucketed join must not shuffle"
    # contrast: the same join on raw frames does shuffle
    raw = fact.join(dim, "key")
    assert not is_exchange_free(raw)
    spark.sql("DROP TABLE fact_b")
    spark.sql("DROP TABLE dim_b")


def test_partitioned_write_rerun_is_idempotent(spark, tmp_path, sf_smoke_dir):
    """Re-running a chunked load with the partitioned strategy must not
    duplicate rows (dynamic partition overwrite)."""
    import os

    from bigdataingestion_spark.config.repository import ConfigRepository
    from bigdataingestion_spark.config.state import TableLoadDetails
    from bigdataingestion_spark.functions.io import load_table
    from bigdataingestion_spark.pipeline.orchestrator import Orchestrator
    from bigdataingestion_spark.sinks.writer import DatalakeWriter
    from bigdataingestion_spark.sources.files import FileSource

    src_dir = tmp_path / "src" / "db"
    os.makedirs(src_dir)
    ev = load_table(spark, sf_smoke_dir, "events").withColumn(
        "createddate", F.col("ts")
    )
    ev.write.parquet(str(src_dir / "events.parquet"))
    config = ConfigRepository(str(tmp_path / "c.parquet"))
    config.insert("dcx_postgresql_db_settings", "db_db_name", "db")
    config.insert("dcx_postgresql_table_settings", "db_tables", "events")
    state_path = str(tmp_path / "s.parquet")
    orch = Orchestrator(
        spark=spark,
        source=FileSource(spark, str(tmp_path / "src")),
        writer=DatalakeWriter(str(tmp_path / "lake")),
        config=config,
        state=TableLoadDetails(state_path),
        single_batch_limit=300,
        write_strategy="partitioned",
    )
    orch.run(run_date="2026-08-13")
    lake = str(tmp_path / "lake" / "events" / "2026" / "08" / "13")
    assert spark.read.parquet(lake).count() == 1000
    # wipe state -> second run re-loads the SAME full data into the same
    # partitions; dynamic overwrite must leave exactly one copy
    os.unlink(state_path)
    orch.run(run_date="2026-08-13")
    assert spark.read.parquet(lake).count() == 1000
