"""Ingestion orchestrator — the reference's main loop, Spark-first.

Reproduces the observable semantics of the reference main command
(``PostgresToDataLake_Ingestion_Notebook.py:442-485``) and
``readingSourceDataAndWritingToFilepath`` (ING:420-437):

  per (db-config x table-config) pair matched on task prefix, per table in
  the comma-separated list:
    1. resolve names/paths (ING:452, getFilePath)
    2. look up last watermark state (ING:453-459)
    3. read source; resolve watermark columns (config override else dtype
       heuristic); re-read with source-side watermark filter if state exists
       (ING:462-466)
    4. count -> volume gate (ING:469, :422):
         count < limit            -> single overwrite write; update state
                                     (no insert — the reference only inserts
                                     state rows on the chunked path, ING:426)
         count >= limit, wm cols  -> chunked append writes; update state
                                     (insert allowed, ING:431)
         count >= limit, no wm    -> bulk overwrite + missing-watermark alert
                                     (ING:432-437)
    5. new state = MAX(COALESCE(wm)) of WRITTEN data minus 80 hours
       (late-data lookback, ING:345-361); fall back to previous state if null
    6. per-table error isolation: log + alert + continue (ING:472-477)

Efficiency redesign vs the reference (SURVEY.md §4):
  - the staged increment is read ONCE and cached; the reference builds an
    unfiltered DataFrame it discards, then triggers a full source read for
    ``.count()`` and more full scans per chunk-planning query
  - chunk profile computed in one aggregation pass (see plans.chunker)
  - ``write_strategy='partitioned'`` writes all chunks in ONE job via
    ``partitionBy`` on derived date columns — at 100 TB this is the only
    sane strategy (the per-chunk loop is kept as ``'chunked'`` for strict
    write-set parity testing; the written *content* is identical)
  - watermark max is computed from the cached staged data, not a re-read of
    the written files, unless ``reread_written=True`` (parity mode)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataingestion_spark.config.repository import ConfigRepository
from bigdataingestion_spark.config.state import TableLoadDetails
from bigdataingestion_spark.plans.chunker import chunk_predicate, plan_chunks, profile_chunks
from bigdataingestion_spark.plans.watermark import resolve_watermark_columns, watermark_expr
from bigdataingestion_spark.sinks.audit import (
    AlertSink,
    AuditLog,
    LogAlertSink,
    failure_alert_body,
    missing_watermark_alert_body,
)
from bigdataingestion_spark.sinks.writer import DatalakeWriter
from bigdataingestion_spark.sources.base import Source
from bigdataingestion_spark.sources.querygen import TableAddress, resolve_table

WATERMARK_LAG_HOURS = 80  # reference ING:350
_UNSET = object()  # sentinel: None is a legitimate precomputed load date
DB_SETTINGS_GROUP = "dcx_postgresql_db_settings"
TABLE_SETTINGS_GROUP = "dcx_postgresql_table_settings"
WATERMARK_SETTINGS_GROUP = "dcx_postgresql_watermark_settings"


@dataclass
class IngestionResult:
    table: str
    path: str | None
    rows: int
    strategy: str  # 'small-overwrite' | 'chunked' | 'bulk-no-watermark' | 'empty' | 'failed'
    chunks: int = 0
    new_watermark: str | None = None
    error: str | None = None


@dataclass
class Orchestrator:
    spark: SparkSession
    source: Source
    writer: DatalakeWriter
    config: ConfigRepository
    state: TableLoadDetails
    audit: AuditLog = field(default_factory=AuditLog)
    alerts: AlertSink = None  # type: ignore[assignment]
    single_batch_limit: int = 1_000_000  # reference default (ING:54)
    write_strategy: str = "chunked"  # 'chunked' (parity) | 'partitioned' (scale)
    reread_written: bool = False  # parity: recompute watermark from written files
    state_database: str = "sharestory"  # the reference hardcodes this (ING:381)
    # optional per-table data-quality gates (lowercased table name ->
    # expectations), evaluated on the staged increment before any write;
    # a failed hard expectation aborts THIS table only (error isolation)
    quality_checks: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.alerts is None:
            self.alerts = LogAlertSink(audit=self.audit)

    # -- helpers --------------------------------------------------------------

    @staticmethod
    def system_type_for(task: str, tbl: str) -> str:
        """Reference special case (ING:454-458): scribe AuditLog tracks state
        under a different system type."""
        if task == "scribe" and tbl == "AuditLog":
            return "databricks"
        return "databricks_prod_new_workspace"

    def _watermark_override(self, task: str, addr: TableAddress) -> str | None:
        """Config key ``{task}_{table}_watermarks`` (ING:151-154)."""
        return self.config.get_value(
            WATERMARK_SETTINGS_GROUP, f"{task.lower()}_{addr.table.lower()}_watermarks"
        )

    def _update_state(
        self,
        system_type: str,
        addr: TableAddress,
        staged: DataFrame,
        watermark_cols: list[str],
        task: str,
        path: str,
        previous: str | None,
        insert_allowed: bool,
        precomputed_load_date=_UNSET,
    ) -> str | None:
        """New watermark = MAX(COALESCE(wm)) − 80h (ING:345-361) then MERGE.

        ``precomputed_load_date``: the caller already computed the lagged max
        in its fused volume-gate aggregate (one job instead of two); honored
        only when not re-reading written files (``reread_written`` recomputes
        from the written path — parity mode keeps its own read)."""
        if precomputed_load_date is not _UNSET and not self.reread_written:
            load_date = precomputed_load_date
        else:
            src = (
                self.writer.read_back(self.spark, task, path).drop(
                    "_ingest_year", "_ingest_month"  # partitioned-write layout cols
                )
                if self.reread_written
                else staged
            )
            row = src.agg(
                (
                    F.max(watermark_expr(watermark_cols))
                    - F.expr(f"INTERVAL {WATERMARK_LAG_HOURS} HOURS")
                ).alias("loadDate")
            ).first()
            load_date = row["loadDate"] if row else None
        if load_date is None:
            load_date = previous  # reference fallback (ING:357-360)
        if load_date is None and not insert_allowed:
            return None
        self.state.merge(
            system_type,
            self.state_database,
            addr.state_key,
            load_date,
            insert_allowed=insert_allowed,
        )
        return str(load_date) if load_date is not None else None

    def _write_chunked(
        self,
        staged: DataFrame,
        watermark_cols: list[str],
        task: str,
        path: str,
        n_partitions: int | None = None,
    ) -> int:
        """Big-volume chunked load. Returns number of chunks/partitions
        written. ``n_partitions``: distinct (year, month) count already
        computed by the caller's fused volume-gate aggregate — passing it
        skips the post-write counting job on the partitioned path."""
        wm = watermark_expr(watermark_cols)
        if self.write_strategy == "partitioned":
            # ONE write job: derive the date-part columns once and let the
            # committer lay out directories; identical row content. Dynamic
            # partition overwrite (session factory) replaces only the
            # partitions present in this batch -> chunk re-runs are
            # idempotent, an upgrade over the reference's at-least-once
            # appends (documented deviation, SURVEY §2.9). The full chunk
            # profile is NOT computed here (the write does its own
            # partitioning); the reported count is a cheap distinct over the
            # month partitions, fused into the volume-gate aggregate when
            # the caller provides it.
            out = staged.withColumn("_ingest_year", F.year(wm)).withColumn(
                "_ingest_month", F.month(wm)
            )
            self.writer.write_partitioned(
                out, task, path, ["_ingest_year", "_ingest_month"]
            )
            if n_partitions is not None:
                return n_partitions
            n = out.select("_ingest_year", "_ingest_month").distinct().count()
            return n
        profile = profile_chunks(staged, watermark_cols)
        chunks = plan_chunks(profile, self.single_batch_limit)
        for chunk in chunks:
            part = staged.filter(chunk_predicate(chunk, watermark_cols))
            self.writer.write(part, task, path, mode="append")
        return len(chunks)

    # -- per-table load --------------------------------------------------------

    def load_table(
        self, db_name: str, task: str, tbl: str, run_date: str | None = None
    ) -> IngestionResult:
        addr = resolve_table(tbl, task)
        run_date = run_date or datetime.now(timezone.utc).strftime("%Y-%m-%d")
        system_type = self.system_type_for(task, tbl)
        last = self.state.get_last_load_date(
            system_type, self.state_database, addr.state_key
        )
        self.audit.add(f"Processing started for table {addr.table}")

        # schema probe only (no partition-bounds side effects), then ONE
        # real read: the watermark-filtered increment if state exists
        override = self._watermark_override(task, addr)
        watermark_cols = resolve_watermark_columns(
            self.source.probe_table(db_name, addr), override
        )
        if last is not None and str(last) != "None":
            staged = self.source.read_increment(db_name, addr, watermark_cols, last)
        else:
            staged = self.source.read_table(db_name, addr)

        staged = staged.cache()
        try:
            # fused volume-gate aggregate (one job, one pass that also
            # materializes the cache): row count + the lagged watermark max
            # the state MERGE needs + the distinct (year, month) partition
            # count the partitioned write reports. The r13 shape ran these
            # as three separate jobs (count, post-write distinct-count, max
            # aggregate) over the same cached increment.
            aggs = [F.count(F.lit(1)).alias("_n")]
            if watermark_cols:
                wm = watermark_expr(watermark_cols)
                aggs.append(
                    (
                        F.max(wm)
                        - F.expr(f"INTERVAL {WATERMARK_LAG_HOURS} HOURS")
                    ).alias("_load_date")
                )
                aggs.append(
                    F.countDistinct(
                        F.struct(F.year(wm).alias("y"), F.month(wm).alias("m"))
                    ).alias("_n_parts")
                )
            stats = staged.agg(*aggs).first()
            count = stats["_n"]
            pre_load_date = (
                stats["_load_date"]
                if watermark_cols and not self.reread_written
                else _UNSET
            )
            self.audit.add(f"Data Load Count From Source - {count}", count)
            if count == 0:
                self.audit.add(f"No Records to load for {addr.table}")
                return IngestionResult(addr.table, None, 0, "empty")

            expectations = self.quality_checks.get(addr.state_key)
            if expectations:
                from bigdataingestion_spark.pipeline.quality import check

                report = check(staged, expectations)  # raises QualityError on hard fail
                for r in report.results:
                    self.audit.add(
                        f"Quality[{addr.table}] {r['name']}: "
                        f"{r['violations']} violations ({r['ratio']})",
                        r["violations"],
                    )

            path = self.writer.run_path(addr.lake_dir, run_date)
            if count < self.single_batch_limit:
                self.writer.write(staged, task, path, "overwrite", approx_rows=count)
                new_wm = None
                if watermark_cols:
                    new_wm = self._update_state(
                        system_type, addr, staged, watermark_cols, task, path,
                        previous=last, insert_allowed=False,
                        precomputed_load_date=pre_load_date,
                    )
                return IngestionResult(
                    addr.table, path, count, "small-overwrite", new_watermark=new_wm
                )
            if watermark_cols:
                n = self._write_chunked(
                    staged, watermark_cols, task, path,
                    n_partitions=(
                        int(stats["_n_parts"])
                        if self.write_strategy == "partitioned"
                        else None
                    ),
                )
                new_wm = self._update_state(
                    system_type, addr, staged, watermark_cols, task, path,
                    previous=last, insert_allowed=True,
                    precomputed_load_date=pre_load_date,
                )
                return IngestionResult(
                    addr.table, path, count, "chunked", chunks=n, new_watermark=new_wm
                )
            # big volume, no watermark -> bulk overwrite + alert (ING:432-437)
            self.writer.write(staged, task, path, "overwrite")
            self.alerts.alert(
                "missing-watermark", missing_watermark_alert_body(addr.table)
            )
            return IngestionResult(addr.table, path, count, "bulk-no-watermark")
        finally:
            staged.unpersist()
            self.audit.add(f"Processing completed for table {addr.table}")

    # -- whole-run loop ---------------------------------------------------------

    def run(self, run_date: str | None = None) -> list[IngestionResult]:
        """The reference main loop (ING:442-485): db-configs x table-configs
        matched on task prefix, per-table error isolation, one audit flush."""
        dbs = self.config.get_group(DB_SETTINGS_GROUP)
        if not dbs:
            raise RuntimeError("No databases detail available in the config table")
        tbls = self.config.get_group(TABLE_SETTINGS_GROUP)
        if not tbls:
            raise RuntimeError("No tables detail available in the config table")

        results: list[IngestionResult] = []
        try:
            for dbs_config, dbs_name in dbs.items():
                for tbl_config, tbl_csv in tbls.items():
                    if dbs_config.split("_")[0] != tbl_config.split("_")[0]:
                        continue
                    task = tbl_config.split("_")[0]
                    for tbl in tbl_csv.split(","):
                        try:
                            results.append(
                                self.load_table(dbs_name, task, tbl, run_date)
                            )
                        except Exception as e:  # noqa: BLE001 — per-table isolation (ING:472-477)
                            msg = str(e)
                            self.audit.add(
                                f"Task Failed while executing for Table: {tbl}, "
                                f"with ERROR: {msg[:500]}"
                            )
                            self.alerts.alert(
                                "table-failure", failure_alert_body(tbl, msg)
                            )
                            results.append(
                                IngestionResult(tbl, None, 0, "failed", error=msg[:500])
                            )
        finally:
            self.audit.flush()
        return results
