"""Stateful streaming sessionization: state survives across micro-batches
and across separate availableNow runs (checkpoint restore)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.streaming.stateful import streaming_sessionize


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def sessions_source(spark, tmp_path):
    # user 1: two sessions (65 min gap); user 2: one session
    batch1 = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00")),
            (1, ts("2024-01-01 10:10:00")),
            (1, ts("2024-01-01 11:15:00")),
            (2, ts("2024-01-01 09:00:00")),
        ],
        ["user_id", "ts"],
    )
    src = str(tmp_path / "landing")
    batch1.coalesce(1).write.parquet(src)
    return src


def test_stateful_sessions_single_run(spark, tmp_path, sessions_source):
    q = streaming_sessionize(
        spark, sessions_source, str(tmp_path / "ck"), gap_seconds=1800,
        queryName="s1",
    )
    q.awaitTermination(120)
    out = {r.user_id: r.n_sessions for r in spark.sql("SELECT * FROM s1").collect()}
    assert out == {1: 2, 2: 1}


def test_state_survives_across_runs(spark, tmp_path, sessions_source):
    src = sessions_source
    ck = str(tmp_path / "ck2")
    out_dir = str(tmp_path / "out")
    q = streaming_sessionize(
        spark, src, ck, gap_seconds=1800, output_dir=out_dir
    )
    q.awaitTermination(120)

    # late-arriving file: user 1 continues (within gap of 11:15), user 2
    # starts a second session (gap > 30 min)
    more = spark.createDataFrame(
        [
            (1, ts("2024-01-01 11:40:00")),
            (2, ts("2024-01-01 12:00:00")),
        ],
        ["user_id", "ts"],
    )
    more.coalesce(1).write.mode("append").parquet(src)
    q2 = streaming_sessionize(
        spark, src, ck, gap_seconds=1800, output_dir=out_dir
    )
    q2.awaitTermination(120)
    out = {
        r.user_id: r.n
        for r in spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max("n_sessions").alias("n"))
        .collect()
    }
    assert out == {1: 2, 2: 2}  # state restored: no session restart for user 1
