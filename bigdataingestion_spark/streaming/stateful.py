"""Custom stateful streaming operator: cross-batch sessionization.

``applyInPandasWithState`` is the engine's seam for stateful logic Spark's
built-in streaming aggregates can't express (per-key session counting whose
state must survive across micro-batches and restarts). State is
(session_count, last_seen_micros) per user; a gap larger than
``gap_seconds`` starts a new session.

Scale notes: state lives in the executor state store, partitioned by key —
per-key state here is 2 longs, so 10^9 users ≈ 16 GB across the cluster.
Arrow moves each micro-batch's rows per key through Python in one batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _sessionize_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n_sessions, last_us = state.get
        else:
            n_sessions, last_us = 0, None
        stamps: list[int] = []
        for pdf in pdfs:
            stamps.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        stamps.sort()
        for us in stamps:
            if last_us is None or us - last_us > gap_us:
                n_sessions += 1
            last_us = us
        state.update((n_sessions, last_us))
        yield pd.DataFrame({"user_id": [user_id], "n_sessions": [n_sessions]})

    return update


def streaming_sessionize(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    fmt: str = "parquet",
    queryName: str = "stream_sessions",
    output_dir: str | None = None,
) -> StreamingQuery:
    """Session counts per user, maintained statefully across micro-batches
    (and across availableNow catch-up runs via the checkpoint).

    Sink: in-memory table named ``queryName`` for single-run inspection, or
    — when ``output_dir`` is given — ``foreachBatch`` parquet appends (the
    memory sink cannot recover from a checkpoint; foreachBatch can). Each
    appended row is a per-key cumulative count, so the current value per
    user is the max (counts are monotonic).
    """
    schema = spark.read.format(fmt).load(source_dir).schema
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 1)  # force state across micro-batches
        .load(source_dir)
        .select("user_id", "ts")
    )
    sessions = stream.groupBy(F.col("user_id")).applyInPandasWithState(
        _sessionize_fn(gap_seconds),
        outputStructType="user_id long, n_sessions long",
        stateStructType="n_sessions long, last_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    if output_dir is not None:

        def sink(batch_df, batch_id: int) -> None:
            batch_df.write.mode("append").parquet(output_dir)

        writer = sessions.writeStream.foreachBatch(sink).outputMode("update")
    else:
        writer = (
            sessions.writeStream.format("memory")
            .queryName(queryName)
            .outputMode("update")
        )
    from bigdataingestion_spark.streaming.ingest import state_scaled_shuffle

    with state_scaled_shuffle(spark):
        return (
            writer.option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
