"""Streaming dead-letter quality gate: per-micro-batch expectation checks
routing clean rows to the lake and violations to a quarantine sink.

The batch pipeline alerts-and-continues on bad data (reference ING:432-437);
a 24/7 stream cannot stop to triage, so the production pattern is a
dead-letter queue: every micro-batch is split by the SAME declarative
expectations the batch gate uses (``pipeline.quality.Expectation``), clean
rows append to the lake, violating rows append — WITH the rule names that
rejected them — to a quarantine directory for replay after the upstream fix.

Scale shape: the expectations compose into one boolean column evaluated in
whole-stage codegen; the batch is cached once per trigger (two outputs, one
parse) and both writes are ordinary partitioned appends. ``foreachBatch``
is the seam because a single streaming query cannot have two file sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from bigdataingestion_spark.pipeline.quality import Expectation


def _violation_labels(expectations: list[Expectation]):
    """array of names of the rules the row violates (NULL predicate = pass,
    matching the batch gate's CASE semantics)."""
    return F.array_compact(
        F.array(
            *[
                F.when(~e.predicate, F.lit(e.name))
                for e in expectations
            ]
        )
    )


def stream_quality_gate(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    expectations: list[Expectation],
    fmt: str = "parquet",
    max_files_per_trigger: int = 64,
) -> StreamingQuery:
    """File-landing-zone -> (lake, dead-letter) streaming split."""
    probe = spark.read.format(fmt).load(source_dir)
    stream = (
        spark.readStream.format(fmt)
        .schema(probe.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )
    labels = _violation_labels(expectations)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tagged = batch_df.withColumn("_violations", labels).cache()
        try:
            clean = tagged.filter(F.size("_violations") == 0).drop("_violations")
            bad = tagged.filter(F.size("_violations") > 0).withColumn(
                "_violations", F.concat_ws(",", "_violations")
            )
            clean.write.mode("append").format(fmt).save(target_dir)
            bad.write.mode("append").format(fmt).save(quarantine_dir)
        finally:
            tagged.unpersist()

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
