"""PySpark Python Data Source over the txlog table format.

``sinks.txlog.TxLogTable`` gives this repo Delta-shaped ACID tables
(ordered commit log + immutable parquet) with a programmatic API. This
module plugs that format into Spark's own source/sink surface via the
Python Data Source API (pyspark >= 4.0), so a txlog table is usable from
the standard reader/writer chains — the way the reference uses
``format("delta")`` end to end (PostgresToDataLake_Ingestion_Notebook.py:
302-306 writes, :256-268 reads):

- ``spark.read.format("txlog").load(path)`` — snapshot read, with
  ``option("version", N)`` / ``option("timestamp", T)`` time travel;
- ``spark.readStream.format("txlog").load(path)`` — a REAL Structured
  Streaming source whose offsets are commit versions (the Delta
  streaming-source shape): each micro-batch reads exactly the files the
  new commits added and Spark's checkpoint owns the offset log (no
  per-batch size cap — see the in-code note on why admission control
  cannot be made safe under this API). Compactions are
  transparent (layout-only commits are skipped); rewrite commits fail the
  stream unless ``allowRewrites`` is set (at-least-once, dedup
  downstream) — the same contract as ``TxLogTable.read_changes``;
- ``df.write.format("txlog").mode("append"|"overwrite").save(path)`` and
  ``df.writeStream.format("txlog")...`` — executors stream Arrow batches
  straight to staged parquet files; the driver registers them in ONE
  atomic log commit (``TxLogTable.commit_files``). With
  ``option("txnAppId", ...)`` each streamed micro-batch commits under
  ``txn_id=f"{appId}:{batchId}"`` and replays no-op in the table's log:
  exactly-once, Delta's ``txnAppId``/``txnVersion`` contract.

Scale: one input partition per data file — reads distribute across
executors and transfer as Arrow record batches, never row-at-a-time
Python. The batch reader prunes hive partition directories via the
explicit ``partitionFilter`` option (``option("partitionFilter",
"cc=us,dt=2024-01-01")``); Catalyst filter pushdown is deliberately NOT
implemented — see the note inside ``_TxLogBatchReader`` for the Spark
4.1 scan-caching hazard that makes stateful ``pushFilters`` unsafe. For
heavy BATCH analytics the native ``TxLogTable.read`` (JVM parquet scan,
whole-stage codegen, full pushdown) remains the hot path — this source's
batch reader is the API-parity and interop surface; the STREAMING source
and the exactly-once stream sink are capabilities the native path does
not have. Like the txlog itself, the table root must be on storage all
executors share.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator, Sequence
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover - typing only
    import pyarrow as pa

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


# --------------------------------------------------------------- shared --


def _arrow_schema(schema: StructType) -> "pa.Schema":
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _phys_names_for(
    schema: StructType, table_schema_json: str | None
) -> tuple | None:
    """Physical parquet column names aligned to ``schema``'s fields for a
    column-mapped table (None when the table is unmapped — the common
    case pays nothing). Mapping metadata lives on the TABLE's log-held
    schema; the reader's ``schema`` param may have been rebuilt without
    metadata, so resolve through the log's copy by logical name."""
    if not table_schema_json:
        return None
    import json as _json

    table_schema = StructType.fromJson(_json.loads(table_schema_json))
    l2p = {
        f.name: (f.metadata or {}).get("txlog.physicalName", f.name)
        for f in table_schema.fields
    }
    if all(k == v for k, v in l2p.items()):
        return None
    return tuple(l2p.get(f.name, f.name) for f in schema.fields)


def _normalize_type(dt):
    """``dt`` with nullability forced True and field metadata stripped,
    recursively. Schema-safety comparisons go through this: a commit
    that only flips a nested field's nullable flag (F.struct() output is
    always nullable, so a mapped overwrite routinely recommits one) or
    carries different nested field METADATA is readable under either
    declaration — neither a wedge nor a rename."""
    from pyspark.sql.types import ArrayType, MapType
    from pyspark.sql.types import StructField as _Sf
    from pyspark.sql.types import StructType as _St

    if isinstance(dt, _St):
        return _St(
            [
                _Sf(f.name, _normalize_type(f.dataType), True)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_normalize_type(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(dt.keyType, _normalize_type(dt.valueType), True)
    return dt


def _same_spark_shape(a, b) -> bool:
    """True when two Spark types differ at most in nested struct field
    names — the signature of a NESTED rename on a column-mapped table
    (same physical layout, swapped logical names)."""
    from pyspark.sql.types import ArrayType, MapType
    from pyspark.sql.types import StructType as _St

    if isinstance(a, _St):
        return (
            isinstance(b, _St)
            and len(a.fields) == len(b.fields)
            and all(
                _same_spark_shape(x.dataType, y.dataType)
                for x, y in zip(a.fields, b.fields)
            )
        )
    if isinstance(a, ArrayType):
        return isinstance(b, ArrayType) and _same_spark_shape(
            a.elementType, b.elementType
        )
    if isinstance(a, MapType):
        return (
            isinstance(b, MapType)
            and a.keyType == b.keyType
            and _same_spark_shape(a.valueType, b.valueType)
        )
    return a == b


def _same_arrow_shape(a: "pa.DataType", b: "pa.DataType") -> bool:
    """True when two arrow types differ AT MOST in nested struct field
    names — i.e. identical buffer layout, so ``Array.view`` is a sound
    zero-copy translation. This is exactly the shape a column-mapped
    table's nested RENAME produces (physical leaf names in the file,
    logical names in the target schema)."""
    import pyarrow.types as pt

    if pt.is_struct(a):
        return (
            pt.is_struct(b)
            and a.num_fields == b.num_fields
            # nullability deliberately ignored: it is not a buffer-layout
            # property (a validity bitmap is always representable), and
            # parquet round-trips routinely flip it
            and all(
                _same_arrow_shape(a.field(i).type, b.field(i).type)
                for i in range(a.num_fields)
            )
        )
    if pt.is_list(a) or pt.is_large_list(a):
        return (
            (pt.is_list(b) or pt.is_large_list(b))
            and type(a) is type(b)
            and _same_arrow_shape(a.value_type, b.value_type)
        )
    if pt.is_map(a):
        return (
            pt.is_map(b)
            and a.key_type == b.key_type
            and _same_arrow_shape(a.item_type, b.item_type)
        )
    return a == b


def _parse_hive_values(rel_path: str) -> tuple[tuple[str, str | None], ...]:
    """``a=1/b=x/part-..parquet`` -> (("a","1"), ("b","x")); hive NULL
    markers decode to None."""
    out = []
    for seg in rel_path.split(os.sep)[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            out.append((k, None if v == _HIVE_NULL else unquote(v)))
    return tuple(out)


def _cdf_tagged_batches(
    path: str,
    partition: "_FilePartition",
    schema: StructType,
    data_schema: StructType,
    data_phys_names: tuple | None,
) -> Iterator["pa.RecordBatch"]:
    """Executor-side CDF read shared by the batch and stream readers:
    project the change file to the DATA schema (change files under
    ``_cdf/`` are written in LOGICAL names by the DML ops; table data
    files carry physical names), then append the constant
    ``_change_type`` / ``_commit_version`` tag columns."""
    import pyarrow as pa

    phys = (
        None
        if partition.rel_path.startswith("_cdf")
        else data_phys_names
    )
    out_schema = _arrow_schema(schema)
    for batch in _file_batches(
        path, partition, _arrow_schema(data_schema), phys
    ):
        n = batch.num_rows
        arrays = list(batch.columns) + [
            pa.array([partition.ctype] * n, pa.string()),
            pa.array([partition.commit_version] * n, pa.int64()),
        ]
        yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)


def _cdf_commit_partitions(
    table, lo: int, hi: int, check_schema, surface: str
) -> list:
    """Change-feed partitions for commits in (lo, hi] — the walk shared
    by the STREAM reader (micro-batch ranges) and the BATCH reader
    (startingVersion/endingVersion). Appends/overwrites are synthesized
    from the commit's file lists (removed files read under the
    PRE-commit deletion-vector state); DML commits deliver the change
    files materialized under _cdf/ when the cdf.enabled property was
    set — without it the read fails actionably rather than fabricating
    changes it cannot know; a commit that removed and masked NOTHING is
    insert-only and synthesizes from its adds regardless."""
    parts: list = []
    for e in table.commits_between(lo, hi):
        op, v = e["op"], e["version"]
        check_schema(e)
        if op in (
            "compact",
            "add_constraint",
            "drop_constraint",
            "set_properties",
            "enable_feature",
            "enable_mapping",
            "rename_column",
            "drop_column",
            "add_generated_column",
        ):
            continue
        if op == "restore":
            raise ValueError(
                f"txlog CDF {surface} hit v{v} (restore): its logical "
                "diff spans arbitrary history; restart the consumer "
                "from a snapshot instead"
            )
        if op in ("append", "convert", "clone"):
            # a clone commit may carry the source's deletion vectors:
            # its bootstrap inserts are the unmasked rows only
            dv = e.get("dv") or {}
            parts.extend(
                _FilePartition(
                    rel,
                    _parse_hive_values(rel),
                    tuple(
                        (int(a), int(c))
                        for a, c in table._load_dv_runs(dv[rel])
                    )
                    if rel in dv
                    else (),
                    "insert",
                    v,
                )
                for rel in e["add"]
            )
            continue
        if op in ("overwrite", "overwrite_partitions"):
            prior = table.snapshot(v - 1)
            for rel in e["remove"]:
                runs: tuple = ()
                if prior and rel in prior.dvs:
                    runs = tuple(
                        (int(a), int(c))
                        for a, c in table._load_dv_runs(prior.dvs[rel])
                    )
                parts.append(
                    _FilePartition(
                        rel, _parse_hive_values(rel), runs, "delete", v
                    )
                )
            parts.extend(
                _FilePartition(rel, _parse_hive_values(rel), (), "insert", v)
                for rel in e["add"]
            )
            continue
        cdf = e.get("cdf")  # delete / update / merge / replace_where
        if cdf is None:
            if not e["remove"] and not e.get("dv"):
                # removed and masked nothing: insert-only commit —
                # its adds ARE the change set (append semantics)
                parts.extend(
                    _FilePartition(
                        rel, _parse_hive_values(rel), (), "insert", v
                    )
                    for rel in e["add"]
                )
                continue
            raise ValueError(
                f"txlog CDF {surface} hit v{v} ({op}) with no "
                "materialized change data — set the cdf.enabled=true "
                "table property (alter_properties) BEFORE DML commits"
            )
        for ctype, rels in cdf.items():
            parts.extend(
                _FilePartition(rel, (), (), ctype, v) for rel in rels
            )
    return parts


@dataclass
class _FilePartition(InputPartition):
    rel_path: str
    part_values: tuple  # (("col", "raw-string-or-None"), ...)
    # deletion-vector runs ((start, count), ...) masking physical row
    # positions of this file; () = nothing masked. Shipped in the
    # partition so the executor-side Arrow read needs no log access.
    dv_runs: tuple = ()
    # change-data-feed reads: the _change_type every row of this file
    # carries, and the commit version that produced it (None = a plain
    # snapshot/stream read, no tagging)
    ctype: str | None = None
    commit_version: int = -1


def _file_batches(
    table_path: str,
    part: _FilePartition,
    target: "pa.Schema",
    phys_names: tuple | None = None,
) -> Iterator["pa.RecordBatch"]:
    """Read one committed parquet file and project it to the TARGET arrow
    schema: present columns are cast, hive partition values become
    constant columns, columns the file predates (additive schema
    evolution) read as nulls — the same semantics the native snapshot
    reader gets from Spark's parquet scan. ``phys_names`` (aligned to
    ``target``'s fields) names the PHYSICAL parquet columns of a
    column-mapped table; the yielded batches always carry the logical
    ``target`` schema."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    full = os.path.join(table_path, part.rel_path)
    values = dict(part.part_values)
    try:
        pf = pq.ParquetFile(full)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"{part.rel_path} is gone from {table_path}: vacuum reclaimed "
            "it. For a STREAM this means the consumer lagged past the "
            "vacuum retention window — restart from a fresh checkpoint "
            "(full re-read) or raise the retention; for a time-travel "
            "read, the requested version is no longer materialized."
        ) from None
    batches = pf.iter_batches()
    offset = 0  # physical row position of the batch's first row
    for batch in batches:
        raw_rows = batch.num_rows
        if part.dv_runs:
            # apply the deletion vector (merge-on-read DELETE): mask rows
            # whose PHYSICAL position falls in a deleted run — positions
            # advance by the pre-filter row count
            import numpy as np

            keep = np.ones(raw_rows, dtype=bool)
            for s, c in part.dv_runs:
                lo, hi = max(s - offset, 0), min(s + c - offset, raw_rows)
                if lo < hi:
                    keep[lo:hi] = False
            if not keep.all():
                batch = batch.filter(pa.array(keep))
        offset += raw_rows
        n = batch.num_rows
        have = {name: i for i, name in enumerate(batch.schema.names)}
        cols = []
        for fi, field in enumerate(target):
            src = phys_names[fi] if phys_names else field.name
            if src in have:
                arr = batch.column(have[src])
                if arr.type != field.type:
                    # nested column mapping: the file holds PHYSICAL
                    # nested struct names; a rename-only divergence has
                    # an identical buffer layout, so view() translates
                    # zero-copy. Anything else (real promotion) casts.
                    if _same_arrow_shape(arr.type, field.type):
                        arr = arr.view(field.type)
                    else:
                        arr = pc.cast(arr, field.type)
            elif field.name in values:
                v = values[field.name]
                if v is None:
                    arr = pa.nulls(n, field.type)
                else:
                    arr = pc.cast(pa.array([v] * n, pa.string()), field.type)
            else:  # file predates this column (additive evolution)
                arr = pa.nulls(n, field.type)
            cols.append(arr)
        yield pa.RecordBatch.from_arrays(cols, schema=target)


# ---------------------------------------------------------------- batch --


class _TxLogBatchReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        from bigdataingestion_spark.sinks.txlog import TxLogTable

        self._path = options["path"]
        table = TxLogTable(self._path)
        version = options.get("version")
        ts = options.get("timestamp")
        if version is not None and ts is not None:
            raise ValueError("pass version or timestamp, not both")
        if ts is not None:
            version = table.version_at_timestamp(float(ts))
        elif version is not None and 0 <= table.version() < int(version):
            # mirror TxLogTable.read: time travel beyond the latest commit
            # is an error, not a silent clamp to HEAD — the two read paths
            # must agree on the contract. An UNINITIALIZED table keeps its
            # own distinct "no committed version" error below.
            raise ValueError(
                f"cannot time travel to v{int(version)}: "
                f"latest is v{table.version()}"
            )
        snap = table.snapshot(int(version) if version is not None else None)
        if snap is None:
            if version is not None or ts is not None:
                raise FileNotFoundError(
                    f"no committed version at {self._path}"
                )
            # uninitialized table + user-supplied .schema(...): an empty
            # scan — the escape hatch the _table_schema error advertises.
            # (Without a user schema, DataSource.schema() already raised.)
            self._files: list = []
            self._pcols: set = set()
            self._dv_runs: dict = {}
        else:
            self._files = list(snap.files)
            self._pcols = set(snap.partition_cols)
            # resolve deletion vectors DRIVER-side (the log is driver
            # territory); executors get plain (start, count) runs in
            # their partition descriptors
            self._dv_runs = {
                rel: tuple(
                    (int(s), int(c)) for s, c in table._load_dv_runs(dv)
                )
                for rel, dv in snap.dvs.items()
            }
        self._schema = schema
        self._phys_names = _phys_names_for(
            schema, snap.schema_json if snap else None
        )
        pf = options.get("partitionFilter")
        if pf:
            self._apply_partition_filter(pf)
        sf = options.get("statsFilter")
        if sf and snap is not None:
            # stateless file PRUNING via the same conservative evaluator
            # the DML paths use (sinks/skipping.py): drops only files the
            # log-held min/max stats PROVE hold no matching row. This is
            # a pruning hint, NOT a row filter — the scan still returns
            # every row of the surviving files, so pair it with the same
            # .filter(...) for exact results (partitionFilter's
            # contract). Unsupported predicate shapes keep all files.
            # session_tz is unknown in the data-source worker, so
            # TIMESTAMP(LTZ) literal terms never prune here (NTZ/DATE
            # do) — strictly conservative either way.
            from bigdataingestion_spark.sinks.skipping import (
                candidate_files,
            )

            self._files = candidate_files(
                sf, snap.schema_json, self._files, snap.file_stats
            )

    # NOTE deliberately NO pushFilters(): Spark 4.1's Python-data-source
    # filter pushdown caches the planned scan on the relation object, and
    # a later query WITHOUT filters on the same DataFrame reuses the
    # previously-filtered scan — silently dropping rows (verified against
    # pyspark 4.1.2: load once, run a filtered collect, then an
    # unfiltered collect -> the second returns the filtered subset). A
    # stateful pushFilters is therefore unsafe no matter how
    # conservatively it prunes. Partition pruning is offered instead via
    # the stateless ``partitionFilter`` option below; full predicate
    # pushdown belongs to the native ``TxLogTable.read`` path (JVM
    # parquet scan).

    def _apply_partition_filter(self, spec: str) -> None:
        """``option("partitionFilter", "cc=us,dt=2024-01-01")``: keep only
        files whose hive partition values match every ``col=value`` pair
        (comma-separated = AND). Explicit and per-reader-instance, so it
        cannot leak between queries the way pushed-down filters do."""
        wanted = []
        for clause in spec.split(","):
            k, sep, v = clause.strip().partition("=")
            if not sep or not k:
                raise ValueError(
                    f"bad partitionFilter clause {clause!r}; use col=value"
                )
            if k not in self._pcols:
                raise ValueError(
                    f"partitionFilter column {k!r} is not a partition "
                    f"column of this table (has: {sorted(self._pcols)})"
                )
            wanted.append((k, v))
        self._files = [
            rel
            for rel in self._files
            if all(
                dict(_parse_hive_values(rel)).get(k) == v for k, v in wanted
            )
        ]

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _FilePartition(
                rel, _parse_hive_values(rel), self._dv_runs.get(rel, ())
            )
            for rel in self._files
        ]

    def read(self, partition: _FilePartition):
        if partition is None:  # zero-file table: Spark still calls read once
            return
        yield from _file_batches(
            self._path,
            partition,
            _arrow_schema(self._schema),
            self._phys_names,
        )


class _TxLogBatchCdfReader(DataSourceReader):
    """Batch change feed (Delta's ``table_changes`` via the reader):
    ``option("readChangeFeed","true")`` + ``startingVersion`` (and
    optionally ``endingVersion``) on ``spark.read.format("txlog")``
    yields the row-level changes of the commits in that range, tagged
    ``_change_type`` / ``_commit_version`` — the same walk, projection,
    and deletion-vector handling as the streaming feed, distributed one
    input partition per change file. The declared schema is the LATEST
    table schema; a range crossing an added/retyped/re-mapped column
    refuses with guidance (the native ``TxLogTable.read_cdf`` handles
    mixed-schema ranges via per-commit schemas)."""

    def __init__(self, options, schema: StructType):
        from bigdataingestion_spark.sinks.txlog import TxLogTable

        clash = [
            o
            for o in (
                "version",
                "timestamp",
                "partitionFilter",
                "statsFilter",
            )
            if options.get(o) is not None
        ]
        if clash:
            # snapshot-read options have no defined meaning on a change
            # feed; silently ignoring them would hand back a broader
            # result than the caller asked for
            raise ValueError(
                f"option(s) {clash} apply to snapshot reads and are "
                "incompatible with readChangeFeed; bound the feed with "
                "startingVersion/endingVersion instead"
            )
        self._path = options["path"]
        table = TxLogTable(self._path)
        self._schema = schema
        self._data_schema = StructType(
            [
                f
                for f in schema.fields
                if f.name not in ("_change_type", "_commit_version")
            ]
        )
        snap = table.snapshot()
        if snap is None:
            raise FileNotFoundError(f"no committed version at {self._path}")
        self._data_phys_names = _phys_names_for(
            self._data_schema, snap.schema_json
        )
        init_l2p = {
            f.name: (f.metadata or {}).get("txlog.physicalName", f.name)
            for f in StructType.fromJson(
                json.loads(snap.schema_json)
            ).fields
        }
        declared = {
            f.name.lower(): _normalize_type(f.dataType)
            for f in self._data_schema.fields
        }
        seen_ok: set = set()

        def check(e: dict) -> None:
            sj = e.get("schema")
            if sj is None or sj in seen_ok:
                return
            commit_schema = StructType.fromJson(json.loads(sj))
            for f in commit_schema.fields:
                have = declared.get(f.name.lower())
                if have is None or have != _normalize_type(f.dataType):
                    why = "added" if have is None else "retyped"
                    raise ValueError(
                        f"txlog batch CDF: v{e['version']} carries "
                        f"column {f.name!r} {why} relative to the "
                        "current schema; this range mixes schemas — "
                        "use TxLogTable.read_cdf, which reads each "
                        "commit under its own schema"
                    )
            drifted = [
                f.name
                for f in commit_schema.fields
                if f.name in init_l2p
                and (f.metadata or {}).get(
                    "txlog.physicalName", f.name
                )
                != init_l2p[f.name]
            ]
            if drifted:
                raise ValueError(
                    f"txlog batch CDF: v{e['version']} used a different "
                    f"physical mapping for column(s) {sorted(drifted)}; "
                    "use TxLogTable.read_cdf for ranges crossing "
                    "drop/re-add"
                )
            seen_ok.add(sj)

        start = int(options.get("startingVersion", 0))
        end_opt = options.get("endingVersion")
        end = int(end_opt) if end_opt is not None else table.version()
        if end > table.version():
            raise ValueError(
                f"cannot read changes to v{end}: latest is "
                f"v{table.version()}"
            )
        if start > table.version():
            # a mis-tracked cursor would otherwise poll forever-empty
            # feeds; Delta errors on an out-of-range starting version too
            raise ValueError(
                f"cannot read changes from v{start}: latest is "
                f"v{table.version()}"
            )
        self._parts = _cdf_commit_partitions(
            table, start - 1, end, check, "batch"
        )

    def partitions(self) -> Sequence[InputPartition]:
        return list(self._parts)

    def read(self, partition: _FilePartition):
        if partition is None:  # empty range: Spark still calls read once
            return
        yield from _cdf_tagged_batches(
            self._path,
            partition,
            self._schema,
            self._data_schema,
            self._data_phys_names,
        )


# --------------------------------------------------------------- stream --


class _TxLogStreamReader(DataSourceStreamReader):
    """Commit versions ARE the offsets: micro-batch (start, end] reads the
    files added by those commits (compact skipped; rewrites refused unless
    allowRewrites). Spark's checkpoint persists the offsets — restart
    resumes exactly where the log was consumed to."""

    def __init__(self, options, schema: StructType):
        from bigdataingestion_spark.sinks.txlog import TxLogTable

        self._path = options["path"]
        self._table = TxLogTable(self._path)
        self._schema = schema
        snap0 = self._table.snapshot()
        # column mapping is static for a stream's lifetime: rename/drop
        # commits change the schema, which _check_commit_schema already
        # refuses mid-stream (restart re-resolves). _init_l2p keeps the
        # FULL mapping (identity included) so drop+re-add drift — which
        # swaps a physical name without touching the logical schema —
        # is detectable even on a table whose names had not yet diverged.
        self._phys_names = _phys_names_for(
            schema, snap0.schema_json if snap0 else None
        )
        self._init_l2p = {}
        if snap0 is not None:
            import json as _json

            self._init_l2p = {
                f.name: (f.metadata or {}).get(
                    "txlog.physicalName", f.name
                )
                for f in StructType.fromJson(
                    _json.loads(snap0.schema_json)
                ).fields
            }
        self._allow_rewrites = str(
            options.get("allowRewrites", "false")
        ).lower() in ("true", "1")
        self._start = int(options.get("startingVersion", 0)) - 1
        self._cdf = str(
            options.get("readChangeFeed", "false")
        ).lower() in ("true", "1")
        self._schemas_seen_ok: set = set()
        if self._cdf:
            # the declared schema carries the two CDF columns; files are
            # projected to the TABLE part and the tags appended per batch
            self._data_schema = StructType(
                [
                    f
                    for f in schema.fields
                    if f.name not in ("_change_type", "_commit_version")
                ]
            )
            self._data_phys_names = _phys_names_for(
                self._data_schema, snap0.schema_json if snap0 else None
            )
        if "maxVersionsPerBatch" in options:
            # DELIBERATELY unsupported. latestOffset() gets no start
            # offset from this API, so a batch-size cap needs state that
            # survives across reader instances — and Spark provably uses
            # MORE THAN ONE instance per running query (observed: a
            # capped 5-commit table produced the offset sequence
            # 4 -> 1 -> 3 -> 4; the retreat to 1 came from a second,
            # freshly-seeded instance, and Spark replayed the overlap:
            # 8 sink rows from 5 source rows). An unsafe knob is worse
            # than none: the uncapped table.version() below is naturally
            # monotonic. Rate-limit upstream (commit cadence) instead.
            raise ValueError(
                "maxVersionsPerBatch is not supported: per-batch offset "
                "caps cannot be made monotonic under Spark's "
                "multi-instance use of DataSourceStreamReader and would "
                "replay overlapping ranges (see in-code note)"
            )

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        # the commit log's version only grows -> monotonic by construction
        return {"version": self._table.version()}

    def _check_commit_schema(self, e: dict) -> None:
        """Delta's streaming contract under source schema evolution: a
        commit whose schema carries a column this stream's fixed schema
        lacks (or retypes) would be silently PROJECTED AWAY by the
        per-file read — new-column values dropped on the floor. Fail the
        batch actionably instead; a RESTARTED stream re-resolves
        ``DataSource.schema()`` to the evolved schema, resumes from the
        checkpointed offset, and re-reads the same commits completely
        (older, narrower commits project under the wider schema with
        nulls). Memoized per schema-json: O(1) per commit after the
        first sighting."""
        sj = e.get("schema")
        if sj is None or sj in self._schemas_seen_ok:
            return
        declared = {
            f.name.lower(): _normalize_type(f.dataType)
            for f in (
                self._data_schema if self._cdf else self._schema
            ).fields
        }
        import json as _json

        commit_schema = StructType.fromJson(_json.loads(sj))
        for f in commit_schema.fields:
            have = declared.get(f.name.lower())
            if have is None or have != _normalize_type(f.dataType):
                # A RENAME (same physical column, swapped logical name —
                # only possible under column mapping) is NOT recoverable
                # by restarting: a micro-batch range spanning both
                # pre-rename and post-rename commits fails under EITHER
                # declared schema ("new name added" before restart, "old
                # name added" after), so the checkpoint itself must be
                # rebased. Detect it by physical identity and say so
                # instead of promising a restart suffices.
                if have is None and self._init_l2p:
                    phys = (f.metadata or {}).get(
                        "txlog.physicalName", f.name
                    )
                    renamed_from = next(
                        (
                            n
                            for n, p in self._init_l2p.items()
                            if p == phys and n.lower() != f.name.lower()
                        ),
                        None,
                    )
                    if renamed_from is not None:
                        raise ValueError(
                            f"txlog stream: v{e['version']} carries "
                            f"column {f.name!r} which is the SAME "
                            f"physical column as {renamed_from!r} in "
                            "this stream's resolved schema — a RENAME. "
                            "A restart cannot recover: any offset range "
                            "spanning the rename fails under either "
                            "schema. Rebase the checkpoint — start a "
                            "fresh stream from the current snapshot "
                            "(for CDF replication, recover_cdf_replica "
                            "re-seeds the replica and checkpoint) — "
                            "then resume following."
                        )
                if have is not None and _same_spark_shape(have, f.dataType):
                    # same physical layout, swapped NESTED logical names:
                    # a nested rename. Like a top-level rename, no single
                    # declared schema satisfies an offset range spanning
                    # it — restarting cannot recover.
                    raise ValueError(
                        f"txlog stream: v{e['version']} renames a nested "
                        f"field inside column {f.name!r} (same physical "
                        "layout, different nested names). A restart "
                        "cannot recover: any offset range spanning the "
                        "rename fails under either schema. Rebase the "
                        "checkpoint — start a fresh stream from the "
                        "current snapshot (for CDF replication, "
                        "recover_cdf_replica re-seeds the replica and "
                        "checkpoint) — then resume following."
                    )
                why = "added" if have is None else "retyped"
                raise ValueError(
                    f"txlog stream: source schema changed at "
                    f"v{e['version']} (column {f.name!r} {why}); restart "
                    "the stream — a fresh start resolves the evolved "
                    "schema and resumes from the checkpoint"
                )
        # column mapping drift: the reader resolved logical->physical at
        # init; a drop + re-add of the SAME logical name (which the
        # added/retyped check above cannot see) gives it a fresh uuid
        # physical name, and reading the new files under the stale
        # mapping would deliver NULLs — silent wrong rows, not the
        # advertised loud refusal. Compare the mapping itself.
        if self._init_l2p:
            commit_map = {
                f.name: (f.metadata or {}).get(
                    "txlog.physicalName", f.name
                )
                for f in commit_schema.fields
            }
            drifted = [
                n
                for n, p in self._init_l2p.items()
                if n in commit_map and commit_map[n] != p
            ]
            if drifted:
                raise ValueError(
                    f"txlog stream: physical column mapping changed at "
                    f"v{e['version']} (column(s) {sorted(drifted)} "
                    "dropped and re-added); restart the stream to "
                    "resolve the new mapping"
                )
        self._schemas_seen_ok.add(sj)

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["version"], end["version"]
        if self._cdf:
            return self._cdf_partitions(lo, hi)
        parts: list[InputPartition] = []
        # commits_between reads only the (lo, hi] commit files: a
        # micro-batch costs O(versions advanced), not O(table history)
        for e in self._table.commits_between(lo, hi):
            self._check_commit_schema(e)
            if e["op"] == "compact":
                continue  # layout-only: content already delivered
            if (
                e["op"] != "append"
                and (e["remove"] or e.get("dv"))
                and not self._allow_rewrites
            ):
                # a deletion-vector commit (merge-on-read DELETE) adds no
                # files but masks rows — rewrite semantics, same refusal
                raise ValueError(
                    f"txlog stream hit v{e['version']} ({e['op']}): rewrite "
                    "commits break rows-added semantics; set allowRewrites "
                    "for at-least-once delivery and deduplicate downstream"
                )
            parts.extend(
                _FilePartition(rel, _parse_hive_values(rel))
                for rel in e["add"]
            )
        return parts

    def _cdf_partitions(self, lo: int, hi: int) -> Sequence[InputPartition]:
        """Streaming change feed (Delta's readChangeFeed): each commit in
        (lo, hi] contributes its change rows — the shared walk in
        ``_cdf_commit_partitions``, schema-guarded per commit."""
        return _cdf_commit_partitions(
            self._table, lo, hi, self._check_commit_schema, "stream"
        )

    def read(self, partition: _FilePartition):
        if partition.ctype is None:
            yield from _file_batches(
                self._path,
                partition,
                _arrow_schema(self._schema),
                self._phys_names,
            )
            return
        yield from _cdf_tagged_batches(
            self._path,
            partition,
            self._schema,
            self._data_schema,
            self._data_phys_names,
        )

    def commit(self, end: dict) -> None:
        # Spark's checkpoint owns offset progress, and reader instances
        # do not survive a query anyway (see the maxVersionsPerBatch
        # note) — nothing to clean up or track here
        pass


# --------------------------------------------------------------- writer --


@dataclass
class _StagedFiles(WriterCommitMessage):
    rel_paths: tuple  # staged files, RELATIVE to the table root


class _TxLogWriterBase:
    """Shared data plane. Protocol constraint (from pyspark's worker
    model, see python_streaming_sink_runner.py): write() runs in executor
    workers on a pickled copy, and the STREAMING commit runs on a FRESH
    writer instance built by ``streamWriter()`` in a separate process —
    so no instance state survives from write to commit, and no live
    SparkSession exists where commit runs. Hence:

    - each write task stages its Arrow batches into its OWN
      ``_staging-ds-{uuid}`` dir under the table root and the commit
      message carries the staged files' RELATIVE paths — commit needs
      only the message plus constructor options;
    - commit renames exactly the message-named files into the root,
      registers them in ONE atomic ``TxLogTable.commit_files`` commit,
      then removes the message-named staging dirs. Staging dirs of
      FAILED task attempts (whose messages never arrive) are reclaimed
      by ``TxLogTable.vacuum`` after the retention window, Delta's
      orphan-file story;
    - CHECK constraints cannot be evaluated here (no SparkSession in the
      commit worker), so a table WITH constraints refuses this write
      path up front — use ``TxLogTable.append``/``merge_upsert``, which
      validate, for constrained tables."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        self._path = options["path"]
        self._schema = schema
        self._overwrite = overwrite
        self._txn_app = options.get("txnAppId")
        from bigdataingestion_spark.sinks.txlog import TxLogTable

        snap = TxLogTable(self._path).snapshot()
        if snap and snap.properties.get("column.mapping") == "name":
            # this data plane streams Arrow batches verbatim (LOGICAL
            # column names) into parquet; on a mapped table the files
            # must carry PHYSICAL names or a post-rename append's data
            # silently vanishes from every read. Runs driver-side at
            # writer construction, before any task stages a byte.
            raise ValueError(
                "format('txlog') writes to a column-mapped table are "
                "unsupported (the Arrow data plane cannot apply "
                "logical->physical renames); write via TxLogTable."
                "append/merge_upsert instead"
            )
        os.makedirs(self._path, exist_ok=True)

    # executor side -------------------------------------------------------
    def write(self, iterator) -> WriterCommitMessage:
        import pyarrow.parquet as pq

        staging = f"_staging-ds-{uuid.uuid4().hex[:12]}"
        name = f"part-{uuid.uuid4().hex}.parquet"
        writer = None
        try:
            for batch in iterator:
                if writer is None:
                    os.makedirs(os.path.join(self._path, staging), exist_ok=True)
                    writer = pq.ParquetWriter(
                        os.path.join(self._path, staging, name), batch.schema
                    )
                writer.write_batch(batch)
        finally:
            if writer is not None:
                writer.close()
        rel = (os.path.join(staging, name),) if writer is not None else ()
        return _StagedFiles(rel_paths=rel)

    # commit side ---------------------------------------------------------
    def _land(self, messages, txn_id: str | None) -> None:
        from bigdataingestion_spark.sinks.txlog import (
            ConcurrentWriteError,
            ConstraintViolationError,
            GeneratedColumnViolationError,
            SchemaEvolutionError,
            TxLogTable,
        )

        table = TxLogTable(self._path)
        staged = [p for m in messages if m is not None for p in m.rel_paths]
        try:
            add = []
            for rel in staged:
                final = f"part-{uuid.uuid4().hex}.parquet"
                os.rename(
                    os.path.join(self._path, rel),
                    os.path.join(self._path, final),
                )
                add.append(final)
            if add or self._overwrite:
                try:
                    # forbid_constraints is enforced INSIDE commit_files'
                    # retry loop, against each fresh snapshot, AFTER its
                    # txn-replay no-op check — a driver-side pre-check here
                    # would race a concurrent add_constraint, and refusing
                    # before the replay check would crash-loop a restarted
                    # exactly-once stream on an already-committed batch
                    table.commit_files(
                        add,
                        self._schema,
                        overwrite=self._overwrite,
                        txn_id=txn_id,
                        forbid_constraints=True,
                    )
                except (
                    ConstraintViolationError,
                    GeneratedColumnViolationError,
                    SchemaEvolutionError,
                    ConcurrentWriteError,
                ):
                    # these are raised strictly BEFORE a commit publishes
                    # (or, for ConcurrentWriteError, when OUR commit
                    # definitively lost) — the files are provably
                    # uncommitted, reclaim them. Any OTHER exception may
                    # have fired after os.link published the entry (e.g.
                    # a failed tmp cleanup on shared storage): deleting
                    # then would corrupt a durable version, so leave the
                    # files for vacuum to adjudicate against the log.
                    table._drop_files(add)
                    raise
        finally:
            self._drop_staging(staged)

    def _drop_staging(self, staged: list) -> None:
        for d in {os.path.dirname(rel) for rel in staged}:
            if d.startswith("_staging-ds-"):
                shutil.rmtree(os.path.join(self._path, d), ignore_errors=True)

    def _abort(self, messages) -> None:
        self._drop_staging(
            [p for m in messages if m is not None for p in m.rel_paths]
        )


class _TxLogBatchWriter(_TxLogWriterBase, DataSourceArrowWriter):
    def commit(self, messages) -> None:
        self._land(messages, txn_id=None)

    def abort(self, messages) -> None:
        self._abort(messages)


class _TxLogStreamWriter(_TxLogWriterBase, DataSourceStreamArrowWriter):
    """``txnAppId`` set -> each micro-batch commits under
    ``{appId}:{batchId}`` and a replayed batch no-ops in the table's log:
    exactly-once across restarts (Delta's txn contract). Without it,
    delivery is at-least-once (a batch replayed after a crash between
    sink commit and checkpoint commit appends twice)."""

    def commit(self, messages, batchId: int) -> None:
        txn = f"{self._txn_app}:{batchId}" if self._txn_app else None
        self._land(messages, txn_id=txn)

    def abort(self, messages, batchId: int) -> None:  # noqa: ARG002
        self._abort(messages)


# ----------------------------------------------------------- datasource --


class TxLogDataSource(DataSource):
    """``format("txlog")`` — see module docstring. Options: ``path``
    (or ``.load(path)``), batch read ``version``/``timestamp``/
    ``partitionFilter``, stream read ``startingVersion``/
    ``allowRewrites``, write ``txnAppId`` (exactly-once streamed
    appends)."""

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def _table_schema(self) -> StructType:
        from bigdataingestion_spark.sinks.txlog import TxLogTable

        path = self.options.get("path")
        if not path:
            raise ValueError("txlog source requires a path")
        snap = TxLogTable(path).snapshot()
        if snap is None:
            raise FileNotFoundError(
                f"no committed txlog version at {path}; pass an explicit "
                ".schema(...) to read an uninitialized table"
            )
        return StructType.fromJson(json.loads(snap.schema_json))

    def schema(self) -> StructType:
        base = self._table_schema()
        if str(self.options.get("readChangeFeed", "false")).lower() in (
            "true",
            "1",
        ):
            from pyspark.sql.types import LongType, StringType, StructField

            return StructType(
                list(base.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                ]
            )
        return base

    def reader(self, schema: StructType) -> DataSourceReader:
        if str(self.options.get("readChangeFeed", "false")).lower() in (
            "true",
            "1",
        ):
            return _TxLogBatchCdfReader(self.options, schema)
        return _TxLogBatchReader(self.options, schema)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _TxLogStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return _TxLogBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _TxLogStreamWriter(self.options, schema, overwrite)


def register(spark) -> None:
    """Make ``format("txlog")`` available on this session."""
    spark.dataSource.register(TxLogDataSource)
