"""bigdataingestion_spark — a PySpark-native incremental ingestion & analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
pipeline ``BigData-Developer/BigDataIngestion`` (config-driven watermark
incremental ingestion Postgres -> data lake), extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
designed for 100 TB scale.

Layout:
    session      SparkSession factory (AQE, shuffle sizing, Arrow)
    config       metadata model: config repository, watermark state, crypto
    sources      Source abstraction: JDBC (query pushdown) and file sources
    plans        watermark-column resolver, adaptive date-chunk planner
    sinks        format/mode/file-size policy writer, audit log, alert sink
    pipeline     orchestrator (per-db x per-table driver loop)
    operators    [EXT] dedup / similarity / text analysis / multimodal
    streaming    Structured Streaming ingestion variant
"""

__version__ = "0.1.0"
