"""Minimal transaction-log table format: Delta-shaped ACID over parquet.

The reference writes Delta tables and relies on its transactional DML —
``format("delta")`` appends/overwrites with mergeSchema
(``PostgresToDataLake_Ingestion_Notebook.py:302-306``) and MERGE-into-state
(``:366-415``). delta-spark is uninstallable in this environment (COVERAGE
deviation #7), so elsewhere this repo maps 'delta' to plain parquet and
hand-rolls MERGE semantics (``sinks/merge.py``). That stand-in preserves
RESULTS but not the transactional properties: a crashed overwrite can leave
a half-written table, a replayed micro-batch double-appends, and readers
racing a writer see partial data.

``TxLogTable`` closes exactly that gap with the same architecture the open
Delta Lake protocol uses (ordered JSON commit log + immutable data files),
re-expressed minimally:

- data files are immutable parquet parts at the table root; a commit is a
  JSON file ``_txlog/{version:08d}.json`` listing files ADDED and REMOVED
  plus the post-commit schema. Readers resolve a snapshot by replaying the
  log — they never list the directory — so a reader always sees a complete
  committed version, never a partial write (snapshot isolation).
- commits are created with ``open(path, "x")`` (create-exclusive): two
  writers racing to the same version -> exactly one wins, the loser gets
  ``ConcurrentWriteError`` and can retry on the new snapshot (optimistic
  concurrency, the Delta protocol's put-if-absent contract; an object-store
  deployment would use its conditional-put primitive here).
- ``append(df, txn_id=...)`` records the application transaction id; a
  replayed id is a silent no-op — the idempotent-sink contract Delta gives
  ``foreachBatch`` (txn appId/version), which upgrades the streaming
  ingest's at-least-once delivery to exactly-once table state.
- ``overwrite`` adds new files and removes all current ones IN ONE COMMIT
  (atomic replace; old files stay on disk for time travel until vacuum).
- ``merge_upsert(source, keys[, order_cols])`` is copy-on-write MERGE:
  snapshot ∪ source resolved per key (source-wins, or latest-wins by
  ``order_cols`` for out-of-order deliveries), rewritten and swapped in one
  commit. File-level pruning (rewriting only files whose key range
  intersects the source) is the 100 TB refinement of the same design.
- ``read(spark, version=N)`` time-travels; ``history()`` is the audit log;
  ``vacuum()`` deletes files unreachable from the latest version.
- schema evolution is additive (mergeSchema): new columns extend the
  committed schema; readers apply the latest schema over old files (absent
  columns read as NULL). A type CONFLICT raises instead of corrupting.

Scale notes: the log is driver-side metadata — O(commits) tiny JSON files,
exactly like Delta's JSON actions (Delta adds parquet checkpoints past 10
commits; same move applies here). Data-plane work (the actual writes, the
merge join) is ordinary distributed Spark. Snapshot file lists are passed
explicitly to the parquet reader, so partition pruning/pushdown behave as
for any parquet scan.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window

_LOG_DIR = "_txlog"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first; re-read and retry."""


class SchemaEvolutionError(ValueError):
    """Non-additive schema change (existing column changed type)."""


@dataclass(frozen=True)
class Snapshot:
    version: int
    files: tuple[str, ...]
    schema_json: str


def _merge_schema(current: StructType, incoming: StructType) -> StructType:
    """Additive union: incoming may add columns; changing an existing
    column's type is refused."""
    by_name = {f.name.lower(): f for f in current.fields}
    out = list(current.fields)
    for f in incoming.fields:
        have = by_name.get(f.name.lower())
        if have is None:
            out.append(f)
        elif have.dataType != f.dataType:
            raise SchemaEvolutionError(
                f"column {f.name}: {have.dataType} -> {f.dataType}"
            )
    return StructType(out)


class TxLogTable:
    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, _LOG_DIR)

    # ------------------------------------------------------------- log --

    def _commit_files(self) -> list[str]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(f for f in os.listdir(self.log_dir) if f.endswith(".json"))

    def version(self) -> int:
        """Latest committed version, -1 for an absent/empty table."""
        commits = self._commit_files()
        return int(commits[-1][:-5]) if commits else -1

    def history(self) -> list[dict]:
        return [
            json.loads(open(os.path.join(self.log_dir, f)).read())
            for f in self._commit_files()
        ]

    def snapshot(self, version: int | None = None) -> Snapshot | None:
        """Replay the log up to ``version`` (latest if None)."""
        entries = self.history()
        if version is not None:
            entries = [e for e in entries if e["version"] <= version]
        if not entries:
            return None
        files: list[str] = []
        for e in entries:
            files = [f for f in files if f not in set(e["remove"])]
            files.extend(e["add"])
        return Snapshot(
            version=entries[-1]["version"],
            files=tuple(files),
            schema_json=entries[-1]["schema"],
        )

    def _txn_ids(self) -> set[str]:
        return {e["txn_id"] for e in self.history() if e.get("txn_id")}

    def _commit(
        self,
        add: list[str],
        remove: list[str],
        schema: StructType,
        op: str,
        txn_id: str | None,
        expected_version: int,
    ) -> int:
        os.makedirs(self.log_dir, exist_ok=True)
        version = expected_version + 1
        entry = {
            "version": version,
            "op": op,
            "add": add,
            "remove": remove,
            "schema": schema.json(),
            "txn_id": txn_id,
        }
        target = os.path.join(self.log_dir, f"{version:08d}.json")
        tmp = target + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        try:
            # create-exclusive: the loser of a version race fails here
            with open(target, "x") as fh:
                fh.write(open(tmp).read())
        except FileExistsError:
            for f in add:  # orphaned data files from the losing writer
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass
            raise ConcurrentWriteError(
                f"version {version} was committed by another writer"
            ) from None
        finally:
            os.remove(tmp)
        return version

    # ------------------------------------------------------------ data --

    def _stage_files(self, df: DataFrame) -> list[str]:
        """Write df as immutable parts at the table root (staged dir, then
        renamed with unique names — invisible until the commit lands)."""
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_staging-{uuid.uuid4().hex[:8]}")
        df.write.parquet(tmp)
        names: list[str] = []
        for f in sorted(os.listdir(tmp)):
            if f.endswith(".parquet"):
                name = f"part-{uuid.uuid4().hex}.parquet"
                os.rename(os.path.join(tmp, f), os.path.join(self.path, name))
                names.append(name)
        shutil.rmtree(tmp)
        return names

    def _next_schema(self, df: DataFrame, merge_schema: bool) -> StructType:
        snap = self.snapshot()
        if snap is None:
            return df.schema
        current = StructType.fromJson(json.loads(snap.schema_json))
        if not merge_schema:
            return current
        return _merge_schema(current, df.schema)

    # ------------------------------------------------------------- ops --

    def append(
        self, df: DataFrame, txn_id: str | None = None, merge_schema: bool = True
    ) -> int:
        """Transactional append. A ``txn_id`` seen before is a no-op (the
        exactly-once contract for replayed micro-batches). Returns the
        committed version (or the current one on a replay no-op)."""
        if txn_id is not None and txn_id in self._txn_ids():
            return self.version()
        schema = self._next_schema(df, merge_schema)
        files = self._stage_files(df)
        return self._commit(files, [], schema, "append", txn_id, self.version())

    def overwrite(self, df: DataFrame, txn_id: str | None = None) -> int:
        """Atomic replace: one commit adds the new files and removes every
        current one. Readers see the old or the new table, never a mix."""
        if txn_id is not None and txn_id in self._txn_ids():
            return self.version()
        snap = self.snapshot()
        files = self._stage_files(df)
        return self._commit(
            files,
            list(snap.files) if snap else [],
            df.schema,
            "overwrite",
            txn_id,
            self.version(),
        )

    def merge_upsert(
        self,
        spark: SparkSession,
        source: DataFrame,
        keys: list[str],
        order_cols: list[str] | None = None,
        txn_id: str | None = None,
    ) -> int:
        """Copy-on-write MERGE INTO: source-wins upsert by ``keys``, or
        latest-wins by ``order_cols`` when deliveries may be out of order
        (the two MERGE shapes in ``sinks/merge.py``, now committed
        atomically). Returns the committed version."""
        if txn_id is not None and txn_id in self._txn_ids():
            return self.version()
        snap = self.snapshot()
        if snap is None:
            merged = source
            if order_cols:
                w = Window.partitionBy(*keys).orderBy(
                    *[F.col(c).desc() for c in order_cols]
                )
                merged = (
                    source.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn")
                )
            files = self._stage_files(merged)
            return self._commit(
                files, [], merged.schema, "merge", txn_id, self.version()
            )
        target = self.read(spark)
        if order_cols:
            w = Window.partitionBy(*keys).orderBy(
                *[F.col(c).desc() for c in order_cols]
            )
            merged = (
                target.unionByName(source, allowMissingColumns=True)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            survivors = target.join(source.select(keys), on=keys, how="left_anti")
            merged = survivors.unionByName(source, allowMissingColumns=True)
        schema = self._next_schema(source, merge_schema=True)
        files = self._stage_files(merged)
        return self._commit(
            files, list(snap.files), schema, "merge", txn_id, self.version()
        )

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot (or time-travel) read: explicit committed file list
        under the committed schema — never a directory listing."""
        snap = self.snapshot(version)
        if snap is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        schema = StructType.fromJson(json.loads(snap.schema_json))
        if not snap.files:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.path, f) for f in snap.files]
        return spark.read.schema(schema).parquet(*paths)

    def vacuum(self) -> list[str]:
        """Delete data files unreachable from the LATEST snapshot (ends
        time travel to older versions; the commit log itself is kept as the
        audit trail). Returns the deleted file names."""
        snap = self.snapshot()
        live = set(snap.files) if snap else set()
        deleted = []
        for f in os.listdir(self.path):
            if f.endswith(".parquet") and f not in live:
                os.remove(os.path.join(self.path, f))
                deleted.append(f)
        return sorted(deleted)
