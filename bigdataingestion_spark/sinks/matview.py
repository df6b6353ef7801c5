"""Incremental materialized aggregate views over txlog tables.

An aggregate view — ``GROUP BY g1..gk`` with ``count`` / ``sum`` /
``avg`` / ``min`` / ``max`` aggregates — is stored as its own
:class:`~bigdataingestion_spark.sinks.txlog.TxLogTable` and REFRESHED
from the source table's change-data feed instead of being recomputed
from scratch. This is classic incremental view maintenance (the
counting algorithm of Gupta, Mumick & Subrahmanian, SIGMOD 1993,
public literature), re-expressed on the lake's CDF + conditional-MERGE
primitives:

- **additive mode** (all aggregates in {count, sum, avg}): one pass
  over the CDF window computes per-group deltas (+row for
  insert/update_postimage, -row for delete/update_preimage), and ONE
  conditional MERGE applies them — update surviving groups, delete
  groups whose row count reaches zero, insert new groups. Refresh cost
  is O(|changes|); the source is never read.
- **recompute mode** (min/max under a window containing deletes — a
  removed extreme cannot be subtracted back out): the CDF window only
  names the AFFECTED groups; those groups are recomputed from the
  current source snapshot via one semi-join (the scan stats-pruned to
  the affected keys' bounds) and merged in (vanished groups deleted).
  Refresh cost is O(|changes| + rows of affected groups) — still never
  O(source).
- **insert-only fast path**: when a metadata-only proof over the
  window's commit entries shows every commit purely ADDED rows (the
  streaming-append common case), even min/max views refresh additively
  — extremes fold monotonically (greatest/least) — so append-driven
  sources never read back regardless of the aggregate set.

At 100 TB this is the difference between a nightly full re-aggregation
of the fact table and a refresh proportional to the day's churn; the
reference pipeline has no equivalent (its summary queries re-aggregate
the full extract every load — see ING:428-447's per-load COUNT/MAX
re-scans, the pattern this module exists to retire).

Exactly-once: each refresh MERGE carries txn id
``matview.cursor.<to_version>`` and the applied-through version is then
recorded in the view's ``matview.source.version`` property. A crash
between the two leaves the txn id behind; the next refresh recovers the
cursor as max(property, committed cursor txn ids), so a window is never
applied twice (the additive path is not idempotent — double-applying a
delta would corrupt sums) and never skipped.

Float caveat (inherent to additive IVM, worth stating): long-lived
additive sums accumulate floating-point drift relative to a from-scratch
aggregation, because (a+b)-b is not always exactly a. Re-anchor on
whatever cadence the workload needs with :meth:`IncrementalAggView.build`
(full) or a recompute-mode refresh (affected groups).

The source table needs ``cdf.enabled=true`` BEFORE the DML whose changes
a refresh must see (appends/overwrites synthesize change rows without
it; row-level DML does not — ``read_cdf`` raises a clear error).

Definitions evolve without a rebuild (r13 add, r14 drop):
:meth:`IncrementalAggView.alter` extends any aggregate/join/union view
with new aggregate columns, backfilled in one anchored source read
while the cursor (and a join view's dimension pins) survive, and drops
existing ones with NO source read (the state is projected and
republished); top-k views refuse with a typed error. Union views
additionally evolve their SHARD MEMBERSHIP in place — see
:meth:`IncrementalUnionAggView.attach_shard` / ``detach_shard``.
Renames/retypes and group/filter changes remain a refusal +
``build()``.

The single-maintainer contract each view assumes is ENFORCEABLE (r14):
constructing a view with ``lease_seconds`` makes every maintenance
entry point CAS-claim a ``matview.lease`` property first — a second
live maintainer gets :class:`MatviewLeaseHeldError` instead of a race,
and an expired lease (dead holder) is claimable by anyone.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .merge_clauses import (
    when_matched_delete,
    when_matched_update,
    when_not_matched_insert,
)
from .txlog import ConcurrentWriteError, TxLogTable

_ADDITIVE = {"count", "sum", "avg"}
# insert-only-additive: monotone folds (min/max) and mergeable sketches
# (approx_distinct's HLL registers are max-merged — order-independent,
# so an additive refresh yields the BIT-IDENTICAL sketch a rebuild
# would); under windows with deletes they recompute. "sql" is the
# recompute-ONLY escape hatch: any complete Spark aggregate expression
# (percentile, stddev, collect_set cardinality, …) — never foldable,
# always maintained by affected-group recompute, still O(|changes| +
# affected-group rows), never O(source)
_FNS = _ADDITIVE | {"min", "max", "approx_distinct", "sql"}
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_DEF_KEY = "matview.definition"
_CURSOR_KEY = "matview.source.version"
_PENDING_KEY = "matview.rebuild.pending"
_TXN_PREFIX = "matview.cursor."
_DIMS_TXN_PREFIX = "matview.dims."
_DIM_EPOCH_KEY = "matview.dims.epoch"
_LEASE_KEY = "matview.lease"


class MatviewLeaseHeldError(RuntimeError):
    """Another LIVE maintainer holds this view's maintenance lease.

    The single-maintainer contract is otherwise trusted, not enforced:
    two concurrent maintainers interleaving property commits and
    overwrites on one view are out of contract and can corrupt state.
    Opting into ``lease_seconds`` makes the contract CHECKABLE — every
    maintenance entry point claims/renews a ``matview.lease`` property
    (holder id + wall-clock expiry) through a CAS commit before
    writing, so a second live maintainer gets this typed refusal
    instead of a race. An EXPIRED lease is claimable by anyone (the
    holder is presumed dead) — ``recover()`` breaking a dead
    maintainer's lease is the same claim path. Advisory caveat,
    documented honestly: a maintainer that STALLS past its own expiry
    and then resumes mid-operation is not fenced at commit time; size
    ``lease_seconds`` above the longest expected maintenance pause."""


class MatviewDefinitionError(ValueError):
    """The view table on disk was built from a DIFFERENT definition
    (group columns / aggregates / source path) than this instance."""


class MatviewStaleDimensionError(ValueError):
    """A join view's DIMENSION table moved past the version the view was
    built against. ``refresh()`` is refused: the fact CDF delta rows
    must be enriched at the SAME dim snapshot the existing state was
    computed from, or the additive arithmetic silently mixes two
    dimension worlds. Two remedies, both explicit:
    :meth:`IncrementalJoinAggView.refresh_dimensions` folds the
    dimension changes in INCREMENTALLY (recompute only the groups the
    changed dim rows touch, from the dim's own CDF) and re-pins;
    ``build()`` re-pins everything from scratch."""


class MatviewWindowUnreadableError(RuntimeError):
    """The CDF window ``(cursor, source-version]`` cannot be replayed —
    a RESTORE commit sits in it (its logical diff spans arbitrary
    history) or its change files were VACUUMed away. The view is NOT
    advanced; ``build()`` re-anchors it from the current snapshot."""


class MatviewSourceSchemaError(MatviewWindowUnreadableError):
    """A refresh window contains a SOURCE schema change the view's
    definition does not survive: a group / aggregate / filter input
    column was dropped, renamed, or retyped by a commit in the window
    (append with mergeSchema can only ADD columns, but an overwrite
    replaces the schema wholesale and rename_column / drop_column
    reshape it in place). The view is NOT advanced.

    The contract, uniform across all four view kinds (aggregate, join,
    top-k, union):

    - a PURELY ADDITIVE change — new columns the definition never
      references — refreshes normally; the definition's projection is
      unaffected and ``read_cdf``'s NULL-padding only touches the new
      columns.
    - a change that makes the definition UNRESOLVABLE under any
      in-window schema, or that alters any state column's TYPE or any
      aggregate INPUT expression's type (a retype can survive
      resolution — Spark will happily ``sum`` a stringified numeric —
      while silently changing the arithmetic), raises this error with
      the window and offending version named. Two documented
      carve-outs follow SQL's own implicit-cast semantics instead of
      refusing: a retype of a column referenced ONLY by the ``where``
      predicate, and a retype under a ``("sql", …)`` aggregate that
      leaves the aggregate's RESULT type unchanged — neither has a
      row-wise projection whose type the probe could pin.
      ``build()`` re-anchors under the current schema iff the
      definition still resolves there: a rebuild replaces the whole
      state in one commit, so no incremental replay ever spans two
      schema worlds. For a union view the same rule applies per shard,
      which also covers shard drift beyond ``unionByName``'s reach
      (same column names, diverged types).

    The cost-based fallback may reach the same rebuild on its own when
    the schema change rode an overwrite large enough to trip
    ``rebuild_ratio`` — that ordering is deliberate (a rebuild is
    always schema-consistent, so it needs no window check)."""


class IncrementalAggView:
    """A GROUP-BY aggregate view over a :class:`TxLogTable`, maintained
    incrementally from the source's change-data feed.

    ``aggs`` maps output column names to ``(fn, expr)`` pairs, e.g.::

        IncrementalAggView(
            source, "/lake/orders_by_status",
            group_cols=["o_orderstatus"],
            aggs={
                "n_orders": ("count", "1"),
                "sum_price": ("sum", "o_totalprice"),
                "avg_price": ("avg", "o_totalprice"),
            },
        )

    ``fn`` ∈ {count, sum, avg, min, max, approx_distinct, sql};
    ``expr`` is any SQL expression over source columns (``count`` counts
    its expression's NON-NULL rows, so ``("count", "1")`` is COUNT(*)).
    ``("sql", <aggregate expression>)`` maintains ANY complete Spark
    aggregate — ``percentile(price, 0.5)``, ``stddev(v)``,
    ``count(DISTINCT k)`` — with recompute-ONLY maintenance: such
    aggregates have no incremental form, so their view refreshes by
    affected-group recompute under every window shape (including
    insert-only; cost stays O(|changes| + affected-group rows)). A
    non-aggregate expression fails loudly at build().
    ``approx_distinct`` stores an HLL sketch (Spark's datasketches
    ``hll_sketch_agg``) and surfaces its estimate — distinct counting
    is the canonical non-additive aggregate, and the sketch is what
    makes it maintainable: under insert-only windows sketches union
    additively (register-max — the refreshed sketch is bit-identical
    to a rebuild's), under deletes the affected groups recompute like
    min/max. SQL NULL semantics are preserved through the incremental
    path: a group whose expression values are all NULL reports NULL
    sum/avg (the stored state keeps a non-null count per sum/avg
    aggregate for this) and approx_distinct 0, exactly as a
    from-scratch aggregation would.

    NULL group keys are REFUSED (build and refresh both probe): the
    refresh MERGE joins on the group columns, and SQL equi-joins never
    match NULL to NULL, so a NULL-keyed group could not be maintained —
    the same restriction Delta MERGE keys carry. COALESCE the key
    expression into a sentinel upstream if NULL groups are meaningful.

    ``where`` (optional) is a SQL predicate over source columns — the
    view aggregates only rows it accepts (``GROUP BY … WHERE …``, SQL
    three-valued semantics: NULL = excluded). Because the predicate is
    ROW-LOCAL and deterministic, incremental maintenance just filters
    the change rows by it: an update moving a row ACROSS the boundary
    nets exactly right (a passing preimage contributes −1, a failing
    postimage contributes nothing), the insert-only proof is unaffected
    (a filtered insert window is still insert-only), and the recompute
    scan applies the same filter. On a join view the predicate is
    evaluated AFTER enrichment, so it may reference the dimension
    columns the joins CARRY (each dim's ``select`` minus its own join
    keys — the same namespace group/aggregate expressions see); an
    uncarried column fails loudly at build() with an unresolved-column
    error.
    """

    def __init__(
        self,
        source: TxLogTable,
        path: str,
        group_cols: list[str],
        aggs: dict[str, tuple[str, str]],
        rebuild_ratio: float | None = 1.0,
        where: str | None = None,
        lease_seconds: float | None = None,
    ):
        self._init_common(
            source, path, group_cols, rebuild_ratio, where, lease_seconds
        )
        if not aggs:
            raise ValueError("aggs must declare at least one aggregate")
        lowered = {g.lower() for g in group_cols}
        for out, (fn, expr) in aggs.items():
            if not _NAME_RE.match(out):
                raise ValueError(f"aggregate output name {out!r} is not a "
                                 "plain SQL identifier")
            if fn not in _FNS:
                raise ValueError(f"unsupported aggregate fn {fn!r} for "
                                 f"{out!r}; supported: {sorted(_FNS)}")
            if out.lower() in lowered:
                raise ValueError(f"aggregate {out!r} collides with a "
                                 "group column")
        self.aggs = {k: (fn, expr) for k, (fn, expr) in aggs.items()}

    def _init_common(
        self,
        source: TxLogTable,
        path: str,
        group_cols: list[str],
        rebuild_ratio: float | None,
        where: str | None,
        lease_seconds: float | None = None,
    ) -> None:
        """Field validation/assignment every view kind shares (the top-k
        subclass has no ``aggs`` dict, so it calls this directly)."""
        if rebuild_ratio is not None and rebuild_ratio <= 0:
            raise ValueError("rebuild_ratio must be positive (or None to "
                             "always refresh incrementally)")
        if lease_seconds is not None and lease_seconds <= 0:
            raise ValueError("lease_seconds must be positive (or None to "
                             "leave the single-maintainer contract "
                             "unenforced)")
        if not group_cols:
            raise ValueError("group_cols must name at least one column")
        for g in group_cols:
            # group columns are interpolated into merge SQL assignment
            # strings (``s.<col>``) — a space or dot would parse as a
            # syntax error or a struct-field reference at refresh time;
            # refuse at construction like aggregate output names
            if not _NAME_RE.match(g):
                raise ValueError(
                    f"group column {g!r} is not a plain SQL identifier"
                )
            # the views' internal state/delta/sentinel columns all lead
            # with an underscore (_mv_*, _d_*, _s_*, _vanish, …); a
            # group key in that namespace would silently collide with
            # them (e.g. '_mv_rank' is OVERWRITTEN by the top-k ranker)
            if g.startswith("_"):
                raise ValueError(
                    f"group column {g!r} collides with the view's "
                    "internal underscore-prefixed namespace"
                )
        self.source = source
        self.path = path
        self.group_cols = list(group_cols)
        self.rebuild_ratio = rebuild_ratio
        self.where = where
        self.lease_seconds = lease_seconds
        # per-HANDLE identity: two handles in one process are two
        # maintainers for lease purposes (matches the contract's unit)
        self._lease_id = uuid.uuid4().hex
        self.view = TxLogTable(path)
        # (files scanned, files in snapshot) of the last recompute-path
        # refresh — introspection for prune measurements, never read by
        # the maintenance logic itself
        self.last_recompute_files: tuple[int, int] | None = None

    # ----------------------------------------------- maintenance lease --
    def _acquire_lease(self) -> None:
        """Claim or renew the maintenance lease (no-op without
        ``lease_seconds``). Acquisition is a CAS commit — read the
        snapshot, check the stored lease, conditionally write at that
        exact version — so two live maintainers racing for a free or
        expired lease serialize on the commit log and the loser gets
        either the winner's unexpired lease (typed refusal) or a
        bounded retry. Renewal skips the commit while more than half
        the validity remains, so a steady maintainer pays one metadata
        commit per ~lease_seconds/2, not per operation."""
        if self.lease_seconds is None:
            return
        for _ in range(8):
            snap = self.view.snapshot()
            if snap is None:
                return  # first build() publishes the view; nothing to lease
            now = time.time()
            cur = snap.properties.get(_LEASE_KEY)
            if cur:
                try:
                    info = json.loads(cur)
                    holder = info.get("holder")
                    expires = float(info.get("expires", 0.0))
                except (ValueError, TypeError):
                    holder, expires = None, 0.0  # corrupt: claimable
                if holder == self._lease_id:
                    if expires - now > self.lease_seconds / 2:
                        return  # comfortably ours: no commit churn
                elif expires > now:
                    raise MatviewLeaseHeldError(
                        f"view at {self.path}: maintenance lease held "
                        f"by {holder} for another {expires - now:.1f}s "
                        "— a second live maintainer is out of contract; "
                        "wait for expiry or stop the other maintainer"
                    )
                # expired or corrupt: claimable (the holder is presumed
                # dead — recover() breaking a dead maintainer's lease is
                # exactly this path)
            try:
                self.view.alter_properties(
                    {
                        _LEASE_KEY: json.dumps(
                            {
                                "holder": self._lease_id,
                                "expires": now + self.lease_seconds,
                            }
                        )
                    },
                    expected_version=snap.version,
                )
                return
            except ConcurrentWriteError:
                continue  # raced another writer: re-read, re-check
        raise MatviewLeaseHeldError(
            f"view at {self.path}: could not acquire the maintenance "
            "lease after repeated commit races"
        )

    def release_lease(self) -> None:
        """Drop the lease if this handle holds it — end-of-maintenance
        courtesy so a successor need not wait out the expiry. Never
        required for correctness (expiry reclaims abandoned leases)."""
        snap = self.view.snapshot()
        if snap is None:
            return
        cur = snap.properties.get(_LEASE_KEY)
        if not cur:
            return
        try:
            if json.loads(cur).get("holder") != self._lease_id:
                return
        except (ValueError, TypeError):
            return
        try:
            self.view.alter_properties(
                {_LEASE_KEY: None}, expected_version=snap.version
            )
        except ConcurrentWriteError:
            pass  # someone else moved the table; expiry will reclaim

    # ------------------------------------------------------ definition --
    def _definition_json(self) -> str:
        d = {
            "source": self.source.path,
            "group_cols": self.group_cols,
            "aggs": {k: list(v) for k, v in self.aggs.items()},
        }
        # key present only when set: views persisted before the filter
        # feature stored no "where" key, and _check_definition compares
        # exact strings — emitting "where": null would force an
        # O(source) rebuild of every existing unfiltered view
        if self.where is not None:
            d["where"] = self.where
        return json.dumps(d, sort_keys=True)

    def _check_definition(self, snap) -> None:
        if snap.properties.get(_PENDING_KEY) == "true":
            raise MatviewDefinitionError(
                f"view at {self.path} has an interrupted rebuild "
                "(matview.rebuild.pending); re-run build()"
            )
        stored = snap.properties.get(_DEF_KEY)
        if stored != self._definition_json():
            raise MatviewDefinitionError(
                f"view at {self.path} was built from a different "
                f"definition (or an interrupted first build); "
                f"stored={stored}, this={self._definition_json()}"
            )

    # ------------------------------------------- window schema contract --
    def _definition_shape(
        self, spark: SparkSession, schema: StructType, view_snap
    ) -> dict[str, str]:
        """name → type fingerprint of the definition evaluated against a
        SOURCE carrying ``schema`` — pure analysis over an empty frame,
        no job runs. Covers the state columns (group keys, aggregate
        state) PLUS each non-"sql" aggregate's raw input-expression
        type: Spark implicitly casts through many retypes (``sum`` over
        a stringified numeric still analyzes to double), so the state
        types alone would miss a ``double → string`` source retype that
        silently starts NULLing unparseable values. The join subclass
        widens the frame with the dimension columns its pinned joins
        carry (``view_snap`` is how it reaches the pins; unused here)."""
        empty = spark.createDataFrame([], schema)
        return self._probe_shape(self._filtered(empty))

    def _probe_shape(self, src: DataFrame) -> dict[str, str]:
        shape = self._schema_shape(self._compute_state(src).schema)
        for out, (fn, expr) in getattr(self, "aggs", {}).items():
            if fn == "sql":
                # a complete aggregate can't be projected row-wise; its
                # STATE column type (above) is the probe — the same
                # implicit-cast carve-out SQL itself has
                continue
            shape[f"_in_{out}"] = (
                src.select(F.expr(expr).alias("_p"))
                .schema[0]
                .dataType.simpleString()
            )
        return shape

    @staticmethod
    def _schema_shape(schema: StructType) -> dict[str, str]:
        """name → type comparison key, nullability-insensitive
        (``simpleString`` drops it): the state is merged by NAME, and
        parquet round-trips flip nullable bits freely."""
        return {f.name: f.dataType.simpleString() for f in schema.fields}

    def _check_window_schema(
        self, spark, frm: int, to: int, view_snap, table: TxLogTable | None = None
    ) -> None:
        """Refuse INCREMENTAL application of a window whose source
        schema no longer supports the definition — see
        :class:`MatviewSourceSchemaError` for the contract. The ANCHOR
        is the source schema at the cursor (``frm``) — the last schema
        the stored state provably reflects. Metadata-only cost:
        O(window commits) driver log reads plus one analysis per
        DISTINCT schema serialization in the window (almost always
        exactly one, in which case the comparison short-circuits before
        any analysis). Metadata-only commits (rename / drop) are
        checked too: they contribute no CDF rows, but letting the
        cursor slide past one would strand the definition against
        every future window."""
        from pyspark.errors import AnalysisException

        table = table if table is not None else self.source
        # the cursor's own commit entry carries the anchor schema — one
        # O(1) file read; a full snapshot(frm) resolution would pay a
        # log-directory listing + checkpoint replay on EVERY refresh
        head = table.commits_between(frm - 1, frm) if frm >= 0 else []
        anchor_json = head[-1].get("schema") if head else None
        if anchor_json is None:
            frm_snap = table.snapshot(frm)
            anchor_json = (
                frm_snap.schema_json if frm_snap is not None else None
            )
        anchor: dict[str, str] | None = None
        seen: set[str] = set()
        for e in table.commits_between(frm, to):
            if e.get("op") == "compact":
                continue
            s = e.get("schema")
            if s is None or s in seen or s == anchor_json:
                continue
            seen.add(s)
            if anchor_json is None:
                # a schema-carrying commit in the window but NO anchor
                # recoverable (pre-schema-recording legacy log whose
                # cursor snapshot also aged out): the retype comparison
                # has nothing to compare AGAINST, so degrading to
                # resolution-only would let a silent retype through —
                # refuse conservatively; build() re-anchors under the
                # current schema in one commit (recover() does this)
                raise MatviewSourceSchemaError(
                    f"view at {self.path}: the window ({frm}, {to}] of "
                    f"{table.path} carries a schema change at "
                    f"v{e['version']} but no anchor schema is "
                    "recoverable at the cursor (legacy log); retype "
                    "safety cannot be verified — the view was NOT "
                    "advanced; call build() (or recover()) to re-anchor"
                )
            if anchor is None:
                # lazily: windows under the unchanged cursor schema (the
                # overwhelmingly common case) never analyze anything
                anchor = self._definition_shape(
                    spark,
                    StructType.fromJson(json.loads(anchor_json)),
                    view_snap,
                )
            st = StructType.fromJson(json.loads(s))
            try:
                got = self._definition_shape(spark, st, view_snap)
            except (AnalysisException, ValueError) as err:
                raise MatviewSourceSchemaError(
                    f"view at {self.path}: the definition does not "
                    f"resolve against the schema of {table.path} "
                    f"v{e['version']} (window ({frm}, {to}]): {err}; "
                    "the view was NOT advanced — build() re-anchors iff "
                    "the definition resolves under the CURRENT schema"
                ) from err
            if anchor is not None and got != anchor:
                diff = sorted(
                    k.removeprefix("_in_")
                    for k in {**anchor, **got}
                    if anchor.get(k) != got.get(k)
                )
                raise MatviewSourceSchemaError(
                    f"view at {self.path}: the schema of {table.path} "
                    f"v{e['version']} (window ({frm}, {to}]) RETYPES "
                    f"definition input(s) {diff} (a source column the "
                    "definition reads changed type); the view was NOT "
                    "advanced — build() re-anchors the state under the "
                    "current schema in one commit"
                )

    # ---------------------------------------------------- state schema --
    def _state_exprs(self) -> list:
        """Aggregate expressions producing the view's STORED state: a
        per-group row count (group-vanish detection + additive delete
        condition) plus, per aggregate, the columns its output derives
        from. sum/avg carry a companion non-null count so NULL semantics
        survive incremental updates."""
        return [
            F.count(F.lit(1)).alias("_mv_n"),
            *self._agg_state_exprs(self.aggs),
        ]

    @staticmethod
    def _agg_state_exprs(aggs: dict) -> list:
        """The per-aggregate state expressions for ``aggs`` alone (no
        ``_mv_n``) — shared by the full state computation and
        :meth:`alter`'s backfill of just the ADDED aggregates."""
        exprs = []
        for out, (fn, expr) in aggs.items():
            col = F.expr(expr)
            if fn in ("sum", "avg"):
                exprs.append(F.sum(col).alias(f"_s_{out}"))
                exprs.append(F.count(col).alias(f"_c_{out}"))
            elif fn == "count":
                exprs.append(F.count(col).alias(f"_c_{out}"))
            elif fn == "approx_distinct":
                # the STORED state is the HLL sketch itself (binary),
                # not the estimate — sketches merge, estimates don't
                exprs.append(F.hll_sketch_agg(col).alias(f"_h_{out}"))
            elif fn == "sql":
                # a complete aggregate expression, evaluated verbatim —
                # recompute-only state, never folded (a non-aggregate
                # expression fails loudly at build with Spark's own
                # grouping-expression AnalysisException)
                exprs.append(F.expr(expr).alias(f"_q_{out}"))
            else:  # min / max
                agg = F.min(col) if fn == "min" else F.max(col)
                exprs.append(agg.alias(f"_m_{out}"))
        return exprs

    def _state_cols(self) -> list[str]:
        return list(
            dict.fromkeys(["_mv_n", *self._agg_state_cols(self.aggs)])
        )

    @staticmethod
    def _agg_state_cols(aggs: dict) -> list[str]:
        out = []
        for name, (fn, _) in aggs.items():
            if fn in ("sum", "avg"):
                out += [f"_s_{name}", f"_c_{name}"]
            elif fn == "count":
                out.append(f"_c_{name}")
            elif fn == "approx_distinct":
                out.append(f"_h_{name}")
            elif fn == "sql":
                out.append(f"_q_{name}")
            else:
                out.append(f"_m_{name}")
        return out

    @property
    def additive(self) -> bool:
        return all(fn in _ADDITIVE for fn, _ in self.aggs.values())

    # (IncrementalTopKView overrides alter() with a typed refusal: it
    # has no aggregate surface to extend)

    @property
    def _insert_only_foldable(self) -> bool:
        """Whether an insert-only window may use the additive fold:
        min/max fold monotonically and HLL sketches union, but a "sql"
        aggregate (percentile, stddev, …) has no incremental form at
        all — its groups recompute under EVERY window shape."""
        return all(fn != "sql" for fn, _ in self.aggs.values())

    def _refuse_null_groups(self, grouped: DataFrame, what: str) -> None:
        """NULL-group-key refusal, checked on an ALREADY-AGGREGATED
        frame (state / deltas / affected keys — ≤ |groups| rows): a
        NULL key survives groupBy as its own group, so probing the
        aggregate catches it without a dedicated extra pass over the
        source or the CDF window. Callers persist the frame first, so
        the probe costs one small job over cached partitions."""
        cond = None
        for g in self.group_cols:
            c = F.col(g).isNull()
            cond = c if cond is None else (cond | c)
        if grouped.filter(cond).limit(1).collect():
            raise ValueError(self._null_group_msg(what))

    def _null_group_msg(self, what: str) -> str:
        return (
            f"NULL group key in {what}: the refresh MERGE joins on "
            f"{self.group_cols} and cannot maintain NULL-keyed "
            "groups; COALESCE the key upstream"
        )

    # --------------------------------------------------------- actions --
    def build(self, spark: SparkSession) -> int:
        """Full (re-)computation: aggregate the CURRENT source snapshot,
        overwrite the view, and pin the cursor at the source version the
        snapshot was read at. Also the re-anchor for additive float
        drift. Build spans multiple commits, so a REBUILD raises a
        ``matview.rebuild.pending`` flag first and clears it last —
        refresh() refuses a pending view (a crash mid-rebuild would
        otherwise let the next refresh double-apply a window over
        already-rebuilt state). Returns the pinned source version."""
        to = self.source.version()
        if to < 0:
            raise FileNotFoundError(f"source {self.source.path} is empty")
        src = self.source.read(spark, version=to)
        return self._build_state(spark, to, src, {})

    def _filtered(self, df: DataFrame) -> DataFrame:
        """Apply the view's ``where`` predicate (no-op when absent) —
        the ONE seam every path shares: build aggregates filtered rows,
        the additive path filters change rows (row-local predicate, so
        boundary-crossing updates net exactly), the recompute scan
        filters before aggregating."""
        return df.filter(F.expr(self.where)) if self.where else df

    def _build_state(
        self, spark, to: int, src: DataFrame, pin_props: dict
    ) -> int:
        """Shared build tail: aggregate ``src`` into the stored state and
        publish it with the cursor pinned at ``to`` (plus any extra
        ``pin_props`` a subclass records — the join view's dimension
        versions)."""
        self._acquire_lease()
        src = self._filtered(src)
        state = self._compute_state(src).persist()
        try:
            self._refuse_null_groups(state, "source")
            if self.view.snapshot() is None:
                # first build: the definition property is what publishes
                # the view — refresh() on a crashed half-build fails
                # clearly
                self.view.append(state)
                self.view.alter_properties(
                    {
                        _DEF_KEY: self._definition_json(),
                        _CURSOR_KEY: str(to),
                        **pin_props,
                    }
                )
            else:
                self.view.alter_properties({_PENDING_KEY: "true"})
                self.view.overwrite(state)
                self.view.alter_properties(
                    {
                        _DEF_KEY: self._definition_json(),
                        _CURSOR_KEY: str(to),
                        _PENDING_KEY: None,
                        **pin_props,
                    }
                )
        finally:
            state.unpersist()
        return to

    def _compute_state(self, src: DataFrame) -> DataFrame:
        """The stored state rows for an (already-filtered) source-shaped
        frame — the one hook build and the recompute path share. The
        aggregate view's state is one groupBy; :class:`IncrementalTopKView`
        overrides this to RANK rows instead."""
        return src.groupBy(*self.group_cols).agg(*self._state_exprs())

    def _cursor(self, snap) -> int:
        """Applied-through source version: the recorded property, raised
        by any committed refresh-merge txn id whose property advance was
        lost to a crash (see module docstring)."""
        frm = int(snap.properties[_CURSOR_KEY])
        for t in snap.txn_ids:
            if t.startswith(_TXN_PREFIX):
                try:
                    frm = max(frm, int(t[len(_TXN_PREFIX):]))
                except ValueError:
                    continue
        return frm

    # ------------------------------------------------- refresh costing --
    def _window_bytes(
        self, frm: int, to: int, table: TxLogTable | None = None
    ) -> int:
        """On-disk bytes a refresh of ``(frm, to]`` must actually READ,
        mirroring ``read_cdf``'s per-op branches: appends/overwrites
        replay their add (and, for overwrite, removed pre-image) files;
        row-level DML with a materialized change map replays ONLY its
        ``_cdf/`` images — its add/remove files are copy-on-write
        rewrite amplification the replay never touches, so counting
        them would overestimate a one-row update on a 1 GB file by the
        whole gigabyte and flip update-heavy-but-row-light workloads to
        needless rebuilds. Vacuumed/absent files count 0 here; the read
        path raises loudly for them (refresh wraps that in
        :class:`MatviewWindowUnreadableError`)."""
        table = table if table is not None else self.source
        total = 0
        for e in table.commits_between(frm, to):
            op = e.get("op")
            cdf = e.get("cdf")
            if op == "compact":
                continue  # layout-only; read_cdf skips it too
            if cdf is not None:
                # materialized change map: the replay reads exactly these
                rels: set[str] = {r for fs in cdf.values() for r in fs}
            elif op in ("overwrite", "overwrite_partitions"):
                rels = set(e.get("add") or ())
                rels.update(e.get("remove") or ())  # pre-image deletes
            elif op in ("append", "convert", "clone"):
                # synthesized inserts from the added files — a clone may
                # ALSO carry deletion vectors (its bootstrap reads the
                # unmasked rows of the same adds), so this branch must
                # come before the dv check below
                rels = set(e.get("add") or ())
            elif not e.get("remove") and not e.get("dv"):
                # DML that matched nothing: synthesized like an append
                rels = set(e.get("add") or ())
            else:
                # rewrite without a change map: read_cdf raises for this
                # window; nothing will be read
                continue
            for r in rels:
                try:
                    total += os.path.getsize(os.path.join(table.path, r))
                except OSError:
                    continue
        return total

    def _window_wants_rebuild(self, frm: int, to: int) -> bool:
        """Cost-based refresh-vs-rebuild decision (metadata-only: commit
        entries + file sizes, no data pass). Incremental refresh costs
        O(window churn) plus a fixed CDF/merge overhead; a full build
        costs one source scan. When the window's bytes reach
        ``rebuild_ratio`` × the source snapshot's bytes (default 1.0 —
        "the delta is as big as the table"), replaying the delta cannot
        beat rescanning, so refresh() falls back to build(), which also
        re-anchors additive float drift for free. Bytes are the proxy
        (rows aren't in the log); under one schema they track rows
        closely. ``rebuild_ratio=None`` disables the fallback (tests
        that pin the incremental path use this)."""
        if self.rebuild_ratio is None:
            return False
        win = self._window_bytes(frm, to)
        if win == 0:
            return False  # metadata-only window: nothing to replay
        src = self._snapshot_bytes(self.source, to)
        # src == 0 (everything deleted): the rebuild is one empty scan —
        # cheaper than replaying the deletes through a merge
        return win >= self.rebuild_ratio * src

    @staticmethod
    def _snapshot_bytes(table: TxLogTable, version: int) -> int:
        """On-disk bytes of a snapshot's data files (vacuumed/absent
        files count 0 — the read path raises for them)."""
        snap = table.snapshot(version)
        total = 0
        for f in snap.files if snap else ():
            try:
                total += os.path.getsize(os.path.join(table.path, f))
            except OSError:
                continue
        return total

    def refresh(self, spark: SparkSession) -> int:
        """Advance the view to the source's current version by applying
        the CDF window ``(cursor, current]``. Additive when every
        aggregate allows it, affected-group recompute otherwise (see
        module docstring for both cost shapes); falls back to a full
        ``build()`` when the window's churn bytes reach ``rebuild_ratio``
        × the source's size (see :meth:`_window_wants_rebuild`). No-op
        when the source has not moved. Returns the source version now
        reflected."""
        snap = self.view.snapshot()
        if snap is None:
            raise FileNotFoundError(
                f"view at {self.path} has no committed build; call build()"
            )
        self._check_definition(snap)
        return self._refresh_checked(spark, snap)

    def recover(self, spark: SparkSession):
        """One-call remediation, mirroring ``recover_cdf_replica``'s
        shape (streaming/ingest.py): refresh when the incremental path
        is open, REBUILD when it is refused — an unreadable/vacuumed
        window, a source schema break, an interrupted rebuild, a
        definition mismatch, or a view that was never built. The
        rebuild replaces the whole state in one commit, so recovery is
        exactly-once regardless of what broke. Returns whatever the
        successful path returns (the cursor; a version vector for union
        views). Deliberately does NOT catch data-shaped errors (a NULL
        group key, a dimension column collision): those need an
        upstream fix, not a rebuild."""
        try:
            return self.refresh(spark)
        except (
            MatviewWindowUnreadableError,
            MatviewDefinitionError,
            FileNotFoundError,
        ):
            return self.build(spark)

    # ------------------------------------------- definition evolution --
    def alter(
        self,
        spark: SparkSession,
        add_aggs: dict | None = None,
        drop_aggs=None,
        rename_aggs: dict | None = None,
    ):
        """Definition evolution without a rebuild and without
        disturbing the cursor — ADD aggregate columns, DROP existing
        ones, RENAME them, or any combination in one commit.

        **Add** (``add_aggs``, the constructor's ``{out: (fn, expr)}``
        shape): the new aggregates' state is backfilled in ONE source
        read at the version the stored state already reflects (the
        cursor; for a join view the fact at the cursor enriched at the
        PINNED dimension versions; for a union view every shard at its
        vector component), then joined onto the existing state —
        existing aggregates are never recomputed. Every supported fn
        works (a new ``("sql", …)`` aggregate simply routes future
        refreshes to recompute, exactly as if declared at
        construction). A new aggregate that does not resolve against
        the anchored source schema raises
        :class:`MatviewDefinitionError` before anything is written.

        **Drop** (``drop_aggs``, a list of existing aggregate output
        names): NO source read at all — the stored state is projected
        without the dropped aggregates' state columns and republished
        with the narrowed definition. Refused: unknown names (which
        covers group columns — they are not aggregates), and dropping
        every aggregate (a view needs at least one; drop the view
        instead). Dropping the last ``("sql", …)`` aggregate makes the
        view additive again — future refreshes fold.

        **Rename** (``rename_aggs``, ``{old: new}``): also NO source
        read — the state columns relabel 1:1 (the ``(fn, expr)`` is
        untouched). The new name must be brand-new: renaming onto ANY
        pre-alter name (an existing aggregate, one being dropped in the
        same call, a swap) changes that name's meaning and is refused.

        NON-additive edits beyond these — retyping an aggregate
        (including drop+re-add or rename-onto of the same name in one
        call), or touching ``group_cols``/``where`` — are refused; a
        changed aggregate is a different definition: build a new view.

        Cost note (measured, SCALE.md): the republish is ONE overwrite
        of the whole state — O(state rows), not O(changed columns) —
        because parquet files are immutable and columnar within a file;
        patching a column in place is not a thing the format offers.
        What alter() saves vs build() is the SOURCE read and the
        existing aggregates' recomputation (drop-only saves the source
        read entirely), which at lake scale is the dominant term; the
        O(state) overwrite is the floor.

        Crash contract: the state overwrite rides the same
        ``matview.rebuild.pending`` flag a rebuild uses — an alter()
        interrupted between overwrite and definition commit is
        remediated exactly like an interrupted rebuild (``recover()``
        / ``build()``; the object in hand already carries the full
        post-alter ``aggs``). Returns what refresh() returns (the
        cursor; a version vector for union views)."""
        from pyspark.errors import AnalysisException

        add_aggs = dict(add_aggs or {})
        drops = list(drop_aggs or [])
        if not add_aggs and not drops and not rename_aggs:
            raise ValueError(
                "alter() needs at least one of add_aggs, drop_aggs or "
                "rename_aggs"
            )
        if len(set(drops)) != len(drops):
            raise ValueError(f"duplicate names in drop_aggs: {drops}")
        for d in drops:
            if d not in self.aggs:
                raise ValueError(
                    f"cannot drop {d!r}: not an aggregate of this view "
                    f"(aggregates: {sorted(self.aggs)}; group columns "
                    "are not droppable)"
                )
        remaining = {
            k: v for k, v in self.aggs.items() if k not in set(drops)
        }
        if not remaining and not add_aggs:
            raise ValueError(
                "dropping every aggregate leaves an empty definition; "
                "drop the view instead"
            )
        # collisions check against the PRE-drop aggregates on purpose:
        # drop+re-add of one name in one call is a rename/retype in
        # disguise — a different definition, refused
        taken = {g.lower() for g in self.group_cols} | {
            a.lower() for a in self.aggs
        }
        renames = dict(rename_aggs or {})
        for old, new in renames.items():
            if old not in self.aggs:
                raise ValueError(
                    f"cannot rename {old!r}: not an aggregate of this "
                    f"view (aggregates: {sorted(self.aggs)})"
                )
            if old in set(drops):
                raise ValueError(
                    f"cannot both drop and rename {old!r} in one alter()"
                )
            if not _NAME_RE.match(new):
                raise ValueError(f"aggregate output name {new!r} is not "
                                 "a plain SQL identifier")
            if new.lower() in taken:
                # includes every PRE-alter name: renaming onto a name
                # that existed (even one being dropped, or a swap) is a
                # change of that name's MEANING — a different
                # definition, refused like any rename-in-disguise
                raise ValueError(
                    f"rename target {new!r} collides with an existing "
                    "aggregate or group column — a reused name is a "
                    "different definition (build a new view)"
                )
            taken.add(new.lower())
        for out, (fn, expr) in add_aggs.items():
            if not _NAME_RE.match(out):
                raise ValueError(f"aggregate output name {out!r} is not "
                                 "a plain SQL identifier")
            if fn not in _FNS:
                raise ValueError(f"unsupported aggregate fn {fn!r} for "
                                 f"{out!r}; supported: {sorted(_FNS)}")
            if out.lower() in taken:
                raise ValueError(
                    f"aggregate {out!r} collides with an existing "
                    "aggregate or group column — alter() is additive "
                    "only; a changed aggregate is a different "
                    "definition (build a new view)"
                )
            taken.add(out.lower())
        snap = self.view.snapshot()
        if snap is None:
            raise FileNotFoundError(
                f"view at {self.path} has no committed build; call build()"
            )
        self._check_definition(snap)
        self._acquire_lease()
        if add_aggs:
            try:
                src, cursor_props, ret = self._alter_anchor(spark, snap)
            except (MatviewStaleDimensionError, MatviewDefinitionError):
                raise  # their own remediation paths, not an unreadable anchor
            except (ValueError, FileNotFoundError, AnalysisException) as e:
                # AnalysisException covers a vacuumed anchor snapshot whose
                # missing data files surface at read construction
                # (PATH_NOT_FOUND)
                raise MatviewWindowUnreadableError(
                    f"view at {self.path}: the anchored source snapshot "
                    f"cannot be resolved ({e}); the view was NOT altered — "
                    "vacuum kept no readable snapshot at the cursor; "
                    "construct the extended view and build() it instead"
                ) from e
            try:
                new_cols = self._filtered(src).groupBy(*self.group_cols).agg(
                    *self._agg_state_exprs(add_aggs)
                )
                new_cols.schema  # analysis only — no job
            except AnalysisException as e:
                raise MatviewDefinitionError(
                    f"view at {self.path}: new aggregate(s) "
                    f"{sorted(add_aggs)} do not resolve against the "
                    f"anchored source schema: {e}"
                ) from e
            # groups match EXACTLY (the stored state is the aggregate of
            # the same filtered read) — left join so a group is never
            # dropped
            merged = self.view.read(spark).join(
                new_cols, self.group_cols, "left"
            )
        else:
            # drop/rename-only: NO source read — the state projection
            # below is the whole data path
            cursor_props, ret = self._alter_cursor_props(snap)
            merged = self.view.read(spark)
        if drops:
            merged = merged.drop(
                *self._agg_state_cols(
                    {k: self.aggs[k] for k in drops}
                )
            )
        for old, new in renames.items():
            # a rename is a pure state-column relabel: the (fn, expr)
            # is untouched, so the per-kind state columns map 1:1
            for oc, nc in zip(
                self._agg_state_cols({old: self.aggs[old]}),
                self._agg_state_cols({new: self.aggs[old]}),
            ):
                merged = merged.withColumnRenamed(oc, nc)
        pre_v = self.view.version()
        self.view.alter_properties({_PENDING_KEY: "true"})
        try:
            self.view.overwrite(merged)
        except Exception as e:
            # exception TYPE cannot tell pre- from post-commit failure
            # (overwrite runs auto-compaction AFTER its commit, and both
            # sides surface Spark job errors) — ask the LOG instead:
            # only when no overwrite landed past pre_v is the view
            # provably still the old state, safe to unlock
            landed = True  # unprovable → stay locked (pending contract)
            try:
                landed = any(
                    e.get("op") == "overwrite"
                    for e in self.view.commits_between(
                        pre_v, self.view.version()
                    )
                )
            except Exception:
                pass
            if landed:
                # state replaced but definition not committed: the
                # stuck-pending contract applies (recover()/build())
                raise
            self.view.alter_properties({_PENDING_KEY: None})
            raise MatviewWindowUnreadableError(
                f"view at {self.path}: alter()'s backfill overwrite "
                f"failed before committing ({e}); the view was NOT "
                "altered (pending cleared) — a common cause is the "
                "anchored snapshot's data files having been vacuumed, "
                "which only the job itself discovers; construct the "
                "extended view and build() it instead"
            ) from e
        self.aggs = {
            **{renames.get(k, k): v for k, v in remaining.items()},
            **add_aggs,
        }
        self.view.alter_properties(
            {
                _DEF_KEY: self._definition_json(),
                _PENDING_KEY: None,
                **cursor_props,
            }
        )
        return ret

    def _alter_cursor_props(self, snap):
        """The cursor properties alter()'s final commit re-asserts and
        its return value, WITHOUT touching the source — the drop-only
        path's replacement for :meth:`_alter_anchor` (the union view
        overrides this with its version vector)."""
        cur = self._cursor(snap)
        return {_CURSOR_KEY: str(cur)}, cur

    def _alter_anchor(self, spark: SparkSession, snap):
        """The source frame alter() backfills from, the cursor
        properties its final commit re-asserts, and its return value —
        the one hook each view kind anchors differently."""
        cur = self._cursor(snap)
        return (
            self.source.read(spark, version=cur),
            {_CURSOR_KEY: str(cur)},
            cur,
        )

    def _refresh_checked(self, spark: SparkSession, snap) -> int:
        """Refresh tail after the existence/definition checks — takes
        the already-resolved view snapshot so subclasses (and the hooks
        below) never replay the view's commit log a second time."""
        self._acquire_lease()
        frm = self._cursor(snap)
        to = self.source.version()
        if to <= frm:
            return frm
        if self._window_wants_rebuild(frm, to):
            return self.build(spark)
        self._check_window_schema(spark, frm, to, snap)
        try:
            ch = self._window_changes(spark, frm, to, snap)
        except (ValueError, FileNotFoundError) as e:
            # a RESTORE in the window (its logical diff spans arbitrary
            # history) or vacuumed change files: the window is gone for
            # good — re-trying cannot help, and silently skipping it
            # would corrupt the additive state. The view is untouched.
            raise MatviewWindowUnreadableError(
                f"view at {self.path}: CDF window ({frm}, {to}] of "
                f"{self.source.path} cannot be replayed ({e}); the view "
                "was NOT advanced — call build() to re-anchor it from "
                "the current source snapshot"
            ) from e
        if self.additive or (
            self._insert_only_foldable
            and self.source.window_is_insert_only(frm, to)
        ):
            # (join views enrich `ch` in _window_changes; the insert-only
            # proof stays valid there because dims are version-pinned)
            # min/max are non-additive only because of DELETES (a
            # removed extreme cannot be subtracted back out); under a
            # pure-insert single-schema window (the txlog owns that
            # proof — it knows its own commit-entry layout) they fold
            # monotonically (greatest/least), so a streaming-append
            # source keeps even min/max views source-read-free
            self._apply_additive(
                spark, ch, to, props_update={_CURSOR_KEY: str(to)}
            )
        else:
            self._apply_recompute(
                spark, ch, to, snap,
                props_update={_CURSOR_KEY: str(to)},
            )
        # the cursor advance RODE the fold/recompute commit (one commit
        # per refresh, no lost-property crash window); the txn-id raise
        # in _cursor() remains as the backstop for histories written
        # before this fusion
        return to

    def _window_changes(
        self, spark: SparkSession, frm: int, to: int, view_snap
    ) -> DataFrame:
        """The change rows a refresh folds in — the source's CDF window,
        hook for subclasses (the join view enriches it here, reading its
        pinned dim versions from ``view_snap`` without another log
        replay)."""
        return self._filtered(self.source.read_cdf(spark, frm, to))

    # -------------------------------------------------- additive path --
    def _apply_additive(
        self, spark, ch: DataFrame, to: int,
        props_update: dict | None = None,
    ) -> None:
        self._apply_additive_delta(
            spark, ch, f"{_TXN_PREFIX}{to}", props_update=props_update
        )

    def _apply_additive_delta(
        self, spark, ch: DataFrame, txn_id: str,
        props_update: dict | None = None,
    ) -> None:
        """Additive fold of a change frame under an explicit txn id —
        the single-source path stamps ``matview.cursor.<to>``, the union
        view a version VECTOR. ``props_update`` rides the fold's MERGE
        commit atomically (the caller's post-fold property advance —
        cursor, membership, pending clear — lands WITH the data, so no
        crash window separates them and no extra metadata commit is
        paid); an empty fold still commits it, metadata-only."""
        # routing invariant: "sql" aggregates have no incremental form,
        # so a window must never reach the fold when one is declared
        assert self._insert_only_foldable, "sql aggregates never fold"
        sign = (
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                F.lit(1),
            )
            .when(
                F.col("_change_type").isin("delete", "update_preimage"),
                F.lit(-1),
            )
            .otherwise(F.lit(0))
        )
        d_exprs = [F.sum(sign).alias("_d_n")]
        upd = {"_mv_n": "t._mv_n + s._d_n"}
        ins = {g: f"s.{g}" for g in self.group_cols}
        ins["_mv_n"] = "s._d_n"
        for out, (fn, expr) in self.aggs.items():
            col = F.expr(expr)
            if fn == "count":
                d_exprs.append(
                    F.coalesce(
                        F.sum(F.when(col.isNotNull(), sign)), F.lit(0)
                    ).alias(f"_d_c_{out}")
                )
                upd[f"_c_{out}"] = f"t._c_{out} + s._d_c_{out}"
                ins[f"_c_{out}"] = f"s._d_c_{out}"
            elif fn in ("sum", "avg"):  # shared (sum, non-null count) state
                d_exprs.append(
                    F.sum(F.when(col.isNotNull(), sign * col)).alias(
                        f"_d_s_{out}"
                    )
                )
                d_exprs.append(
                    F.coalesce(
                        F.sum(F.when(col.isNotNull(), sign)), F.lit(0)
                    ).alias(f"_d_c_{out}")
                )
                # NULL-correct fold: the stored sum is NULL iff no
                # non-null value remains (SQL SUM over an all-NULL or
                # empty group), never a fake 0
                upd[f"_s_{out}"] = (
                    f"CASE WHEN t._c_{out} + s._d_c_{out} = 0 THEN NULL "
                    f"ELSE coalesce(t._s_{out}, 0) + coalesce(s._d_s_{out}, 0) "
                    "END"
                )
                upd[f"_c_{out}"] = f"t._c_{out} + s._d_c_{out}"
                ins[f"_s_{out}"] = f"s._d_s_{out}"
                ins[f"_c_{out}"] = f"s._d_c_{out}"
        for out, (fn, expr) in self.aggs.items():
            if fn not in ("min", "max", "approx_distinct"):
                continue
            # reached ONLY under an insert-only window (refresh's
            # metadata proof): every change row is an insert, so these
            # fold without subtraction — extremes monotonically
            # (least/greatest), sketches by register-max union (which
            # yields the BIT-IDENTICAL sketch a full rebuild would).
            # NULL-correct: an all-NULL delta keeps the stored value; an
            # all-NULL stored value adopts the delta (SQL MIN/MAX ignore
            # NULLs; an all-NULL sketch is the EMPTY sketch, never NULL,
            # so its union is a no-op — the CASE is pure defense).
            col = F.expr(expr)
            if fn == "approx_distinct":
                d_exprs.append(
                    F.hll_sketch_agg(col).alias(f"_d_h_{out}")
                )
                upd[f"_h_{out}"] = (
                    f"CASE WHEN s._d_h_{out} IS NULL THEN t._h_{out} "
                    f"WHEN t._h_{out} IS NULL THEN s._d_h_{out} "
                    f"ELSE hll_union(t._h_{out}, s._d_h_{out}) END"
                )
                ins[f"_h_{out}"] = f"s._d_h_{out}"
                continue
            agg = F.min(col) if fn == "min" else F.max(col)
            d_exprs.append(agg.alias(f"_d_m_{out}"))
            fold = "least" if fn == "min" else "greatest"
            upd[f"_m_{out}"] = (
                f"CASE WHEN s._d_m_{out} IS NULL THEN t._m_{out} "
                f"WHEN t._m_{out} IS NULL THEN s._d_m_{out} "
                f"ELSE {fold}(t._m_{out}, s._d_m_{out}) END"
            )
            ins[f"_m_{out}"] = f"s._d_m_{out}"
        deltas = ch.groupBy(*self.group_cols).agg(*d_exprs)
        # drop groups whose window nets to NOTHING — zero row delta AND
        # zero on every value delta (insert+delete of identical rows) —
        # so the MERGE's touched-file set (key-range pruned) stays
        # proportional to genuinely moved groups. Row delta alone is NOT
        # enough: an in-group UPDATE nets zero rows but nonzero sums.
        moved = F.col("_d_n") != 0
        for c in deltas.columns:
            if c.startswith("_d_s_"):
                moved = moved | (F.coalesce(F.col(c), F.lit(0)) != 0)
            elif c.startswith("_d_c_"):
                moved = moved | (F.col(c) != 0)
        deltas = deltas.filter(moved).persist()
        try:
            # ONE fused probe job replaces three scheduler round trips:
            # the merge's key-bounds agg also carries per-key null
            # counts (the NULL-group refusal) and a row count (empty-
            # window early exit), and materializes the persisted deltas
            # every later merge job reads from cache
            bounds, row = self.view._source_key_bounds(
                deltas,
                list(self.group_cols),
                extra_aggs=[F.count(F.lit(1)).alias("_mv_nrows")],
            )
            if any(bounds[g]["nulls"] for g in self.group_cols):
                raise ValueError(self._null_group_msg("change feed"))
            if not row["_mv_nrows"]:
                # nothing moved: no merge, but the caller's property
                # advance must still land
                if props_update is not None:
                    self.view.alter_properties(props_update)
                return
            self.view.merge(
                spark,
                deltas,
                keys=list(self.group_cols),
                clauses=[
                    # final row count zero -> the group vanished
                    when_matched_delete(condition="t._mv_n + s._d_n = 0"),
                    when_matched_update(set=upd),
                    # insert conditions see the bare source row (merge's
                    # scoping contract); skip groups created and
                    # destroyed within one window
                    when_not_matched_insert(
                        values=ins, condition="_d_n > 0"
                    ),
                ],
                txn_id=txn_id,
                # deltas is a groupBy on exactly the merge keys: unique
                # by construction, so the cardinality guard and the
                # finding pass's distinct shuffle are provably safe to
                # skip, and the bounds job above is not repeated
                source_keys_unique=True,
                source_key_bounds=bounds,
                properties_update=props_update,
            )
        finally:
            deltas.unpersist()

    # ------------------------------------------------- recompute path --
    def _apply_recompute(
        self, spark, ch: DataFrame, to: int, view_snap=None,
        props_update: dict | None = None,
    ) -> None:
        # (view_snap unused here: the single-table recompute needs only
        # the SOURCE snapshot; the join subclass reads its dim pins from
        # it)
        # persisted: the affected-key list feeds the semi-join and the
        # merge source's left join — the bounds probe below materializes
        # the cache FIRST, so the two concurrent references inside the
        # merge's resolution job read it instead of re-running the CDF
        # scan + distinct (measured r15: a lazy cache under one AQE
        # collect gets its leaf stages submitted concurrently and
        # recomputed per reference)
        affected = ch.select(*self.group_cols).distinct().persist()
        try:
            # one fused job: the pruned scan's key bounds double as the
            # NULL-group probe (per-key null counts ride the bounds agg)
            bounds = self.source._source_key_bounds(
                affected, list(self.group_cols)
            )
            if any(bounds[g]["nulls"] for g in self.group_cols):
                raise ValueError(self._null_group_msg("change feed"))
            # the semi-join is the EXACT filter, but without help it
            # still scans every source file first; the log-held per-file
            # min/max stats (the same machinery MERGE's finding pass
            # uses) prove files outside the affected keys' bounds out of
            # the scan — on a key-clustered layout a narrow change
            # window reads O(affected-span) files, not the table
            scan, self.last_recompute_files = self._pruned_scan(
                spark, self.source, to, affected, bounds=bounds
            )
            fresh = self._compute_state(
                self._filtered(scan).join(
                    affected, self.group_cols, "left_semi"
                )
            )
            self._merge_fresh_state(
                spark, affected, fresh, f"{_TXN_PREFIX}{to}",
                bounds=bounds, props_update=props_update,
            )
        finally:
            affected.unpersist()

    def _pruned_scan(
        self,
        spark,
        table: TxLogTable,
        version: int,
        affected: DataFrame,
        bounds: dict | None = None,
    ):
        """One source's rows at ``version``, stats-pruned to the
        affected keys' bounds before the exact semi-join the caller
        applies: the log-held per-file min/max (the same machinery
        MERGE's finding pass uses) prove files outside the bounds out
        of the scan — on a key-clustered layout a narrow change window
        reads O(affected-span) files, not the table. Returns
        (scan, (files scanned, files in snapshot)); an empty candidate
        set (window touched only since-deleted groups) yields a
        zero-row frame from the snapshot already in hand."""
        snap = table.snapshot(version)
        if bounds is None:
            bounds = table._source_key_bounds(affected, self.group_cols)
        cand = table._stats_candidates(
            snap, bounds, self.group_cols, null_safe=False
        )
        if cand:
            scan = table._read_files(spark, snap, cand)
        else:
            scan = spark.createDataFrame(
                [], StructType.fromJson(json.loads(snap.schema_json))
            )
        return scan, (len(cand), len(snap.files))

    def _merge_fresh_state(
        self, spark, affected: DataFrame, fresh: DataFrame, txn_id: str,
        bounds: dict | None = None, props_update: dict | None = None,
    ) -> None:
        """Recompute-path merge tail: replace the affected groups' state
        with ``fresh``, delete groups the recompute proved vanished.
        ``txn_id`` carries the exactly-once identity: fact-cursor
        refreshes use ``matview.cursor.<to>``, dimension refreshes
        ``matview.dims.<version-vector>`` — distinct spaces, so a dim
        merge can never be deduplicated against a fact merge.
        ``bounds`` (the affected keys' bounds the pruned scan already
        collected — a conservative superset of the merge source's) and
        the keys-unique proof (fresh is a groupBy on the keys; vanished
        is disjoint from it) skip the merge's own probe jobs;
        ``props_update`` rides the commit (see
        :meth:`_apply_additive_delta`)."""
        # ONE left join replaces the anti-join + union: a group missing
        # from `fresh` (all its rows gone) null-extends and flags
        # _vanish=1, a surviving group carries its state with _vanish=0
        # — row-identical to the old union, but `fresh`'s whole agg
        # subtree (the pruned scan + groupBy) is consumed ONCE instead
        # of twice (the anti-join branch re-ran it), and both sides are
        # already partitioned by the group keys so no new exchange
        src = affected.join(
            fresh.withColumn("_vanish", F.lit(0)),
            self.group_cols,
            "left",
        ).withColumn("_vanish", F.coalesce(F.col("_vanish"), F.lit(1)))
        state_cols = self._state_cols()
        self.view.merge(
            spark,
            src,
            keys=list(self.group_cols),
            clauses=[
                when_matched_delete(condition="s._vanish = 1"),
                when_matched_update(
                    set={c: f"s.{c}" for c in state_cols}
                ),
                when_not_matched_insert(
                    condition="_vanish = 0",  # bare source scope
                    values={
                        **{g: f"s.{g}" for g in self.group_cols},
                        **{c: f"s.{c}" for c in state_cols},
                    },
                ),
            ],
            txn_id=txn_id,
            source_keys_unique=True,
            source_key_bounds=bounds,
            properties_update=props_update,
        )

    # ----------------------------------------------------------- read --
    def read(self, spark: SparkSession) -> DataFrame:
        """The presentable view: group columns + declared aggregate
        outputs, derived from the stored state (sum/avg surface SQL NULL
        semantics through the companion counts)."""
        snap = self.view.snapshot()
        if snap is None:
            raise FileNotFoundError(
                f"view at {self.path} has no committed build; call build()"
            )
        self._check_definition(snap)
        df = self.view.read(spark)
        cols = [F.col(g) for g in self.group_cols]
        for out, (fn, _) in self.aggs.items():
            if fn == "sum":
                cols.append(
                    F.when(
                        F.col(f"_c_{out}") > 0, F.col(f"_s_{out}")
                    ).alias(out)
                )
            elif fn == "avg":
                cols.append(
                    F.when(
                        F.col(f"_c_{out}") > 0,
                        F.col(f"_s_{out}") / F.col(f"_c_{out}"),
                    ).alias(out)
                )
            elif fn == "count":
                cols.append(F.col(f"_c_{out}").alias(out))
            elif fn == "approx_distinct":
                cols.append(
                    F.hll_sketch_estimate(F.col(f"_h_{out}")).alias(out)
                )
            elif fn == "sql":
                cols.append(F.col(f"_q_{out}").alias(out))
            else:
                cols.append(F.col(f"_m_{out}").alias(out))
        return df.select(*cols)


# ===================================================================== #
# join views: GROUP-BY aggregates over fact ⋈ dimension(s)              #
# ===================================================================== #


class DimJoin:
    """One dimension joined onto the fact (or onto an earlier dimension
    — snowflake chains work) in an :class:`IncrementalJoinAggView`.

    - ``on``: equi-join pairs ``(left_col, dim_col)`` — ``left_col``
      names a column of the frame enriched SO FAR (fact columns plus
      earlier dims' carried columns), ``dim_col`` a column of this
      dimension. Inner-join semantics: fact rows with no dimension match
      contribute nothing, exactly like the defining query.
    - ``select``: the dimension columns carried into the enriched frame
      (defaults to all). Carried names must not collide with columns
      already present — the view refuses rather than shadow.
    - ``broadcast``: hint the dimension side (default True — dimensions
      are bounded; disable for a dimension too large to broadcast)."""

    def __init__(
        self,
        table: TxLogTable,
        on: list[tuple[str, str]],
        select: list[str] | None = None,
        broadcast: bool = True,
    ):
        if not on:
            raise ValueError("DimJoin.on must name at least one key pair")
        for lc, dc in on:
            for c in (lc, dc):
                if not _NAME_RE.match(c):
                    raise ValueError(
                        f"join column {c!r} is not a plain SQL identifier"
                    )
        if select is not None:
            for c in select:
                if not _NAME_RE.match(c):
                    raise ValueError(
                        f"selected dim column {c!r} is not a plain SQL "
                        "identifier"
                    )
        self.table = table
        self.on = [(lc, dc) for lc, dc in on]
        self.select = list(select) if select is not None else None
        self.broadcast = broadcast


class IncrementalJoinAggView(IncrementalAggView):
    """An aggregate view over ``fact ⋈ dim_1 ⋈ … ⋈ dim_k`` — the most
    common real rollup shape (revenue by nation = lineitem ⋈ supplier ⋈
    nation) — maintained incrementally from the FACT table's change feed.

    The increment is delta-enrichment: the fact CDF window's rows are
    joined to the dimension snapshots the view was built against
    (broadcast for bounded dims), after which the additive /
    insert-only / affected-group machinery of the base class applies
    unchanged — a preimage row enriches to exactly the contribution it
    made when it was added, BECAUSE the dimensions are frozen.

    That freeze is load-bearing, so each dimension's table version is
    pinned in the view's properties at build time and every refresh
    re-checks it: a moved dimension raises
    :class:`MatviewStaleDimensionError` and the view is untouched —
    ``build()`` re-pins and heals. (The incremental upgrade for
    dimension changes — recompute the groups whose dim attributes
    moved, from the dim's own CDF — is documented on the error class;
    refusal is the cheapest always-correct rule, matching how Delta MVs
    fall back to full recompute on dimension updates.)

    The recompute path (min/max under deletes) prunes the FACT scan
    through the dimensions: the affected groups name dimension
    attributes, the restricted dimension rows name fact join-key values,
    and the fact's log-held per-file key stats prove files outside those
    bounds out of the scan — on a fact laid out by join key, a narrow
    change window reads O(affected-span) files even though the group
    columns live two joins away."""

    _DIM_KEY = "matview.dim.{i}.version"

    def __init__(
        self,
        source: TxLogTable,
        path: str,
        group_cols: list[str],
        aggs: dict[str, tuple[str, str]],
        dims: list[DimJoin],
        rebuild_ratio: float | None = 1.0,
        where: str | None = None,
        register_pins: bool = False,
        lease_seconds: float | None = None,
    ):
        super().__init__(
            source, path, group_cols, aggs, rebuild_ratio, where,
            lease_seconds,
        )
        if not dims:
            raise ValueError(
                "dims must name at least one dimension (use "
                "IncrementalAggView for single-table views)"
            )
        self.dims = list(dims)
        # opt-in: record this view's pinned dim versions as
        # ``matview.pin.<view-id>`` properties ON THE DIMENSIONS, which
        # their vacuum() honors as a retention floor — a routine dim
        # vacuum can then never strand the view's pinned snapshot or
        # the CDF window refresh_dimensions() replays. Off by default
        # because the floor retains dim history until the view re-pins
        # (and forever if the view is dropped without unpin_dims()),
        # and because each (re)pin is one property commit on the dim.
        self.register_pins = bool(register_pins)

    # ------------------------------------------------------ definition --
    def _definition_json(self) -> str:
        return json.dumps(
            {
                "source": self.source.path,
                "group_cols": self.group_cols,
                "aggs": {k: list(v) for k, v in self.aggs.items()},
                **({"where": self.where} if self.where is not None else {}),
                "dims": [
                    {
                        "path": d.table.path,
                        "on": [list(p) for p in d.on],
                        "select": d.select,
                    }
                    for d in self.dims
                ],
            },
            sort_keys=True,
        )

    # ------------------------------------------------------ dim pinning --
    def _pin_key(self) -> str:
        """This view's pin property key on its dimensions — derived
        from the view's absolute path, so re-pinning overwrites (one
        floor per view per dim) and two views pinning the same dim
        never collide."""
        digest = hashlib.sha1(
            os.path.abspath(self.path).encode("utf-8")
        ).hexdigest()[:16]
        return f"matview.pin.{digest}"

    def _advance_floor(self, d: DimJoin, v: int) -> None:
        """Set this view's vacuum floor on dimension ``d`` to version
        ``v``. Called only AFTER the state that depends on ``v`` is
        committed (build's publish, refresh_dimensions' fold + re-pin),
        so a failure anywhere earlier leaves the OLD floor protecting
        the snapshot the view still reflects. The floor commit's own
        bump on the dim is metadata-only movement, tolerated by
        :meth:`_check_dims_unmoved`. A concurrent dim writer can
        conflict the property commit — bounded retry, then SWALLOW: the
        view state is already durable and a lagging floor only protects
        MORE history (the next successful advance converges it), so a
        committed maintenance operation must never be reported failed
        over its floor bookkeeping — EXCEPT when no floor exists at all
        (the first registration): swallowing there would leave the pins
        silently unprotected, the one state register_pins promises
        cannot happen, so that case raises after the retries."""
        key = self._pin_key()
        for attempt in range(6):
            try:
                d.table.alter_properties({key: str(v)})
                return
            except ConcurrentWriteError:
                time.sleep(0.02 * (attempt + 1))  # back off past the burst
        snap = d.table.snapshot()
        if snap is not None and key in snap.properties:
            return  # an older floor stands: lagging only protects more
        raise RuntimeError(
            f"view at {self.path}: could not register the FIRST vacuum "
            f"floor on {d.table.path} (concurrent writers kept "
            "conflicting); the view state is committed, but its pins "
            "are NOT vacuum-protected — retry the operation (or call "
            "refresh_dimensions()) when the dimension quiesces"
        )

    def unpin_dims(self) -> None:
        """Remove this view's vacuum-floor pins from every dimension —
        call when dropping the view, or the floors retain dim history
        indefinitely. Safe when no pin was ever registered."""
        key = self._pin_key()
        for d in self.dims:
            snap = d.table.snapshot()
            if snap is not None and key in snap.properties:
                d.table.alter_properties({key: None})

    def _dim_props(self, versions: list[int]) -> dict:
        return {
            self._DIM_KEY.format(i=i): str(v)
            for i, v in enumerate(versions)
        }

    def _pinned_dim_versions(self, snap) -> list[int]:
        """The dim versions the STATE actually reflects: the pinned
        properties, raised componentwise by any committed
        ``matview.dims.e<epoch>.<v0>-<v1>-…`` merge txn id whose
        property advance was lost to a crash — the dim-side mirror of
        :meth:`_cursor`. Without the recovery, a crash between a dim
        merge and its re-pin followed by ANOTHER dim movement would
        compute the next affected-group window from the stale pins and
        permanently miss the groups the committed merge already rewrote.

        Only txn ids of the CURRENT build epoch count: ``build()`` bumps
        ``matview.dims.epoch``, so (a) a lingering txn id from before a
        re-anchor can never override a fresh build's pins (a re-created
        dim table restarting at v1 would otherwise be stuck behind a
        max() with the dead epoch's vector until txn retention expired),
        and (b) a post-rebuild dim refresh reaching the same version
        vector as a pre-rebuild one is a NEW txn, never deduplicated
        into a silent no-op."""
        out = []
        for i, d in enumerate(self.dims):
            key = self._DIM_KEY.format(i=i)
            if key not in snap.properties:
                raise MatviewDefinitionError(
                    f"view at {self.path} has no pinned version for "
                    f"dimension {i} ({d.table.path}); re-run build()"
                )
            out.append(int(snap.properties[key]))
        prefix = self._dims_txn_prefix(snap)
        for t in snap.txn_ids:
            if not t.startswith(prefix):
                continue
            parts = t[len(prefix):].split("-")
            if len(parts) != len(out):
                continue
            try:
                vec = [int(p) for p in parts]
            except ValueError:
                continue
            out = [max(a, b) for a, b in zip(out, vec)]
        return out

    @staticmethod
    def _dims_txn_prefix(snap) -> str:
        epoch = snap.properties.get(_DIM_EPOCH_KEY, "0")
        return f"{_DIMS_TXN_PREFIX}e{epoch}."

    def _heal_dim_pins(self, snap, pinned: list[int]) -> None:
        """Persist txn-recovered pins into the properties: txn ids age
        out of the snapshot at checkpoint roll (retention), so a pin
        advance lost to a crash must be re-recorded the first time any
        maintenance path observes the recovery — not only when
        refresh_dimensions happens to be called."""
        stored = [
            int(snap.properties[self._DIM_KEY.format(i=i)])
            for i in range(len(self.dims))
        ]
        if stored != pinned:
            self.view.alter_properties(self._dim_props(pinned))

    @staticmethod
    def _dim_data_moved(d: DimJoin, frm: int, to: int) -> bool:
        """Whether ``(frm, to]`` contains any commit that can change
        what a VERSION-PINNED read of the dimension sees. The
        classification itself lives on the txlog (it owns its commit-op
        taxonomy, next to ``window_is_insert_only``)."""
        return not d.table.window_is_metadata_only(frm, to)

    def _check_dims_unmoved(self, snap) -> list[int]:
        pinned = self._pinned_dim_versions(snap)
        effective = list(pinned)
        for i, (d, v) in enumerate(zip(self.dims, pinned)):
            cur = d.table.version()
            if cur == v:
                continue
            if cur > v and not self._dim_data_moved(d, v, cur):
                # metadata-only movement — typically this view's OWN
                # vacuum-floor property advance, or cdf enablement:
                # data at `cur` is bit-identical to the pin, so the
                # version-pinned enrichment stays exact; tolerating it
                # here avoids bouncing every refresh through a no-op
                # refresh_dimensions cycle
                effective[i] = cur
                continue
            raise MatviewStaleDimensionError(
                f"view at {self.path}: dimension {d.table.path} moved "
                f"(pinned v{v}, now v{cur}); the CDF deltas must be "
                "enriched at the pinned snapshot — call "
                "refresh_dimensions() to fold the dim changes in "
                "incrementally, or build() to re-pin from scratch"
            )
        stored = [
            int(snap.properties[self._DIM_KEY.format(i=i)])
            for i in range(len(self.dims))
        ]
        if effective != stored:
            # ONE heal write covers both recovery shapes: txn-recovered
            # pins (pinned > stored after a crash between a dim merge
            # and its re-pin) and tolerated metadata-only windows
            # (effective > pinned) — effective is the componentwise max
            # of the two, so neither heal can clobber the other. Safe
            # because the dim data is bit-identical across the
            # tolerated window; this refresh still enriches at the OLD
            # pins (they are what the resolved snapshot carries), the
            # next one starts from the healed values, bounding the
            # trailing-commit re-scan. Best-effort bookkeeping: a
            # concurrent refresher racing the same commit must not fail
            # an otherwise-healthy refresh — the loser re-heals next
            # time.
            try:
                self.view.alter_properties(self._dim_props(effective))
            except ConcurrentWriteError:
                pass
        return pinned

    # ------------------------------------------------------ enrichment --
    def _enrich(
        self,
        spark: SparkSession,
        df: DataFrame,
        versions: list[int],
        dim_filters: dict[int, DataFrame] | None = None,
    ) -> DataFrame:
        """Fold the dimensions onto ``df`` (fact rows or CDF change rows)
        at the given pinned versions. Inner joins; each dim contributes
        its carried columns (``select`` minus its own join keys), with
        name collisions refused. ``dim_filters`` (dim index → frame of
        that dim's join-key values) semi-joins a dimension down before
        the fold — refresh_dimensions uses it to make the enrichment
        mean "fact rows whose path passes through a CHANGED dim row"."""
        for idx, (d, v) in enumerate(zip(self.dims, versions)):
            dim_df = d.table.read(spark, version=v)
            if dim_filters and idx in dim_filters:
                dim_df = dim_df.join(
                    dim_filters[idx],
                    [dc for _, dc in d.on],
                    "left_semi",
                )
            on_dim = [dc for _, dc in d.on]
            want = d.select if d.select is not None else list(dim_df.columns)
            missing = [
                c
                for c in {*on_dim, *want}
                if c not in dim_df.columns
            ]
            if missing:
                raise ValueError(
                    f"dimension {d.table.path} has no column(s) "
                    f"{sorted(missing)}"
                )
            carried = [c for c in want if c not in on_dim]
            dim_df = dim_df.select(
                *dict.fromkeys([*on_dim, *carried])
            )
            clash = [c for c in carried if c in df.columns]
            if clash:
                raise ValueError(
                    f"dimension {d.table.path} columns {clash} collide "
                    "with the enriched frame; narrow DimJoin.select or "
                    "rename upstream"
                )
            bad = [lc for lc, _ in d.on if lc not in df.columns]
            if bad:
                raise ValueError(
                    f"join column(s) {bad} not present on the enriched "
                    f"frame (have: {df.columns}); order dims so each "
                    "joins on fact or earlier-dim columns"
                )
            cond = None
            for lc, dc in d.on:
                c = df[lc] == dim_df[dc]
                cond = c if cond is None else cond & c
            right = F.broadcast(dim_df) if d.broadcast else dim_df
            df = df.join(right, cond, "inner").select(
                *[df[c] for c in df.columns],
                *[dim_df[c] for c in carried],
            )
        return df

    # --------------------------------------------------------- actions --
    def build(self, spark: SparkSession) -> int:
        # pin the dim versions FIRST, then read everything at the pins —
        # a dimension advancing mid-build cannot split the state between
        # two dimension worlds
        to = self.source.version()
        if to < 0:
            raise FileNotFoundError(f"source {self.source.path} is empty")
        versions = []
        for d in self.dims:
            v = d.table.version()
            if v < 0:
                raise FileNotFoundError(
                    f"dimension {d.table.path} is empty"
                )
            versions.append(v)
        if self.register_pins:
            # dims with NO standing floor get one BEFORE the read — a
            # first registration has nothing a failed build could
            # strand, and the floor protects the (possibly long) build
            # read from a concurrent vacuum. Dims with an existing
            # floor keep it until the publish commits (below): a
            # failed REBUILD must leave the old pins protected.
            key = self._pin_key()
            for d, v in zip(self.dims, versions):
                dsnap = d.table.snapshot()
                if dsnap is None or key not in dsnap.properties:
                    self._advance_floor(d, v)
        enriched = self._enrich(
            spark, self.source.read(spark, version=to), versions
        )
        # a (re)build starts a new dim epoch: txn ids of earlier epochs
        # stop participating in pin recovery and can never collide with
        # this anchor's future dim-refresh txn ids
        prev = self.view.snapshot()
        epoch = int((prev.properties if prev else {}).get(_DIM_EPOCH_KEY, 0))
        out = self._build_state(
            spark,
            to,
            enriched,
            {**self._dim_props(versions), _DIM_EPOCH_KEY: str(epoch + 1)},
        )
        if self.register_pins:
            # floors advance only AFTER the publish commit — a rebuild
            # dying anywhere above leaves the OLD floor protecting the
            # pins the (still-live) previous state reads at
            for d, v in zip(self.dims, versions):
                self._advance_floor(d, v)
        return out

    def refresh(self, spark: SparkSession) -> int:
        # one snapshot resolution serves the existence check, the
        # definition check, the dim-pin check, the cursor read, and both
        # hooks below (threaded through _refresh_checked as view_snap)
        snap = self.view.snapshot()
        if snap is None:
            raise FileNotFoundError(
                f"view at {self.path} has no committed build; call build()"
            )
        self._check_definition(snap)
        # _check_dims_unmoved also heals the stored pins (txn-recovered
        # values AND tolerated metadata-only windows) in one write
        pinned = self._check_dims_unmoved(snap)
        return self._refresh_checked(spark, snap)

    def recover(self, spark: SparkSession):
        """Join-view remediation ladder, cheapest rung first: plain
        refresh; on moved dimensions the INCREMENTAL dim fold
        (``refresh_dimensions``) then refresh; only when the dim window
        itself is unreplayable (vacuumed pinned snapshot or CDF gap —
        the case ``register_pins=True`` exists to prevent) fall back to
        a full ``build()``, which re-pins everything from the current
        snapshots in one commit."""
        try:
            return self.refresh(spark)
        except MatviewStaleDimensionError:
            try:
                self.refresh_dimensions(spark)
                return self.refresh(spark)
            except (
                MatviewWindowUnreadableError,
                MatviewDefinitionError,
                FileNotFoundError,
            ):
                return self.build(spark)
        except (
            MatviewWindowUnreadableError,
            MatviewDefinitionError,
            FileNotFoundError,
        ):
            return self.build(spark)

    def _alter_anchor(self, spark: SparkSession, snap):
        """alter() anchor for the join view: the fact at the cursor,
        enriched at the PINNED dimension versions — new aggregates
        (which may reference carried dim columns) are computed in the
        same dimension world the stored state reflects. Moved
        dimensions refuse first (run ``refresh_dimensions`` /
        ``recover()`` before altering); the pins themselves are
        untouched."""
        pinned = self._check_dims_unmoved(snap)
        cur = self._cursor(snap)
        return (
            self._enrich(
                spark, self.source.read(spark, version=cur), pinned
            ),
            {_CURSOR_KEY: str(cur)},
            cur,
        )

    def _window_changes(
        self, spark: SparkSession, frm: int, to: int, view_snap
    ) -> DataFrame:
        ch = self.source.read_cdf(spark, frm, to)
        versions = self._pinned_dim_versions(view_snap)
        # enrichment is change-type-agnostic: _change_type /
        # _commit_version ride through the joins untouched, and a
        # preimage row joining k dim rows contributes -k exactly as its
        # insert contributed +k (same frozen snapshot, same fan-out).
        # The view predicate applies AFTER enrichment (it may reference
        # dim columns)
        return self._filtered(self._enrich(spark, ch, versions))

    def _definition_shape(
        self, spark: SparkSession, schema: StructType, view_snap
    ) -> dict[str, str]:
        """Fact-schema check under the PINNED dimension joins: the empty
        probe frame is enriched exactly like a CDF window would be, so
        a fact schema change that breaks a join key, a carried-column
        collision, or a group/agg input retype surfaces here — still
        analysis-only (empty fact side; nothing executes)."""
        return self._shape_with_dims(
            spark, schema, self._pinned_dim_versions(view_snap)
        )

    def _shape_with_dims(
        self, spark: SparkSession, schema: StructType, versions: list[int]
    ) -> dict[str, str]:
        """The definition's shape under an explicit dim version vector —
        shared by the fact-window check (pinned versions) and
        refresh_dimensions' DIM-drift check (current versions)."""
        empty = spark.createDataFrame([], schema)
        enriched = self._enrich(spark, empty, versions)
        shape = self._probe_shape(self._filtered(enriched))
        # fact-side JOIN KEY types are part of the contract too: an
        # equi-join condition implicitly casts (long fact key vs long
        # dim key retyped to string still analyzes), silently turning
        # matches into NULL-compares — pin the pre-enrichment types
        fact_types = {f.name: f.dataType.simpleString() for f in schema}
        for d in self.dims:
            for lc, _ in d.on:
                if lc in fact_types:
                    shape[f"_jk_{lc}"] = fact_types[lc]
        # ... and the DIM side of each key: a dim key retyped between
        # versions implicit-casts through the join exactly like a fact
        # key would (join keys are excluded from the carried columns,
        # so nothing else in the shape sees them). Metadata-only
        # snapshot resolution; an unresolvable pin surfaces through the
        # enrichment above with its own typed error.
        for i, (d, v) in enumerate(zip(self.dims, versions)):
            dsnap = d.table.snapshot(v)
            if dsnap is None:
                continue
            dtypes = {
                f.name: f.dataType.simpleString()
                for f in StructType.fromJson(
                    json.loads(dsnap.schema_json)
                ).fields
            }
            for _, dc in d.on:
                if dc in dtypes:
                    shape[f"_dk_{i}_{dc}"] = dtypes[dc]
        return shape

    # ------------------------------------------- dimension maintenance --
    def refresh_dimensions(self, spark: SparkSession) -> list[int]:
        """Fold MOVED dimensions into the view incrementally — the
        upgrade path past :class:`MatviewStaleDimensionError` — and
        re-pin them. The fact cursor is untouched: the state stays
        consistent at (fact = cursor, dims = current), and a subsequent
        :meth:`refresh` advances the fact side as usual.

        The increment: each moved dimension's OWN CDF window
        ``(pinned, current]`` names the changed dim rows by their join
        keys; the affected groups are the groups those keys reach
        through the fact — computed under the OLD dims (groups losing
        contributions) and the NEW dims (groups gaining them, including
        fact rows that only NOW find a match) — and exactly those
        groups are recomputed from the fact snapshot at the cursor,
        enriched with the new dims, via the same stats-pruned machinery
        the fact-CDF recompute path uses. Cost is O(dim churn + rows of
        reached groups), never O(fact): moving one supplier to another
        nation recomputes two nations, not the table.

        Requirements, enforced loudly: the moved dims need
        ``cdf.enabled=true`` before their DML (their change rows are
        what names the affected keys), no dim may have REWOUND
        (restore), and the fact snapshot at the cursor must still be
        readable (not vacuumed) — any of these raises
        :class:`MatviewWindowUnreadableError` with the ``build()``
        hint and the view is untouched. Exactly-once: the merge carries
        txn id ``matview.dims.<new-version-vector>`` (distinct from the
        fact-cursor id space), so a crash between the merge and the
        re-pin replays as a committed no-op. Returns the dim versions
        now pinned."""
        snap = self.view.snapshot()
        if snap is None:
            raise FileNotFoundError(
                f"view at {self.path} has no committed build; call build()"
            )
        self._check_definition(snap)
        self._acquire_lease()
        # crash-recovered: property pins raised by committed dim-merge
        # txn ids (see _pinned_dim_versions) — a replay after a lost
        # pin advance windows from the state the MERGE left, never from
        # the stale property
        pinned = self._pinned_dim_versions(snap)
        current = [d.table.version() for d in self.dims]
        if current == pinned:
            # state already reflects the current dims; heal the property
            # pins if only the metadata advance was lost (txn ids can
            # age out of the snapshot — the property must not lag
            # forever)
            self._heal_dim_pins(snap, pinned)
            return pinned
        cursor = self._cursor(snap)
        src_snap = self._require_snapshot(
            self.source, cursor, "the fact snapshot at the cursor"
        )
        changed: list[tuple[int, DataFrame]] = []
        affected = None
        try:
            for i, (d, old, new) in enumerate(
                zip(self.dims, pinned, current)
            ):
                if new == old:
                    continue
                if new < old:
                    raise MatviewWindowUnreadableError(
                        f"view at {self.path}: dimension {d.table.path} "
                        f"REWOUND (pinned v{old}, now v{new} — a "
                        "restore?); its forward diff is gone — call "
                        "build() to re-anchor"
                    )
                if not self._dim_data_moved(d, old, new):
                    # metadata-only lag (e.g. this view's own floor
                    # advance): nothing to fold for this dim; the
                    # re-pin at the end converges the window
                    continue
                # the discovery reads this dim at BOTH versions; the old
                # snapshot may have been vacuumed out from under the pin
                self._require_snapshot(
                    d.table, old,
                    f"dimension {d.table.path} at its pinned v{old}",
                )
                try:
                    ch = d.table.read_cdf(spark, old, new)
                except (ValueError, FileNotFoundError) as e:
                    raise MatviewWindowUnreadableError(
                        f"view at {self.path}: dimension {d.table.path} "
                        f"window (v{old}, v{new}] cannot be replayed "
                        f"({e}); the view was NOT advanced — call "
                        "build() to re-pin from the current snapshots"
                    ) from e
                on_dim = [dc for _, dc in d.on]
                changed.append((i, ch.select(*on_dim).distinct().persist()))
            if not changed:
                # every movement was metadata-only: the data is
                # bit-identical at the new versions, so just re-pin —
                # no fold, no schema check, no floor movement
                self.view.alter_properties(self._dim_props(current))
                return current
            # DIM-side schema contract (the dim mirror of
            # _check_window_schema), checked AFTER the per-dim
            # replayability checks above so a vacuumed pinned snapshot
            # keeps its own typed error: the definition evaluated under
            # the NEW dim versions must keep the shape it had under the
            # pins — a dim dropping a carried column makes the fold
            # unresolvable, a retyped carried group/agg column would
            # silently corrupt the state merge. Analysis-only, anchored
            # at the fact cursor schema both sides so only the DIM
            # movement is measured.
            from pyspark.errors import AnalysisException

            src_schema = StructType.fromJson(
                json.loads(src_snap.schema_json)
            )
            try:
                fresh_shape = self._shape_with_dims(
                    spark, src_schema, current
                )
            except (AnalysisException, ValueError) as err:
                raise MatviewSourceSchemaError(
                    f"view at {self.path}: the definition does not "
                    f"resolve against the moved dimension schemas "
                    f"(pinned {pinned} -> current {current}): {err}; "
                    "the view was NOT advanced — build() re-anchors iff "
                    "the definition resolves under the current schemas"
                ) from err
            try:
                anchor_shape = self._shape_with_dims(
                    spark, src_schema, pinned
                )
            except (AnalysisException, ValueError) as err:
                # a pin vacuumed between the replayability checks and
                # this analysis (race): same remedy as any lost window
                raise MatviewWindowUnreadableError(
                    f"view at {self.path}: the pinned dimension "
                    f"snapshots {pinned} are no longer readable "
                    f"({err}) — call build() to re-pin from the "
                    "current snapshots"
                ) from err
            if fresh_shape != anchor_shape:
                diff = sorted(
                    k.removeprefix("_in_")
                    for k in {**anchor_shape, **fresh_shape}
                    if anchor_shape.get(k) != fresh_shape.get(k)
                )
                raise MatviewSourceSchemaError(
                    f"view at {self.path}: the moved dimension schemas "
                    f"RETYPE definition input(s) {diff} (pinned "
                    f"{pinned} -> current {current}); the view was NOT "
                    "advanced — build() re-anchors the state under the "
                    "current schemas in one commit"
                )
            # groups reached by the changed dim keys through the fact,
            # under the OLD dims (losing contributions) and the NEW dims
            # (gaining them — including fact rows that only now match).
            # The fact is read AT THE CURSOR so the recomputed state
            # composes with the deltas already applied. Per changed dim
            # and per side, the dim chain is restricted to the changed
            # keys FIRST, and the restricted chain's fact-link bounds
            # stats-prune the discovery scan — at 100 TB finding the
            # reached groups costs O(span of the changed keys' fact
            # rows), never a full fact pass. (One scan per changed dim
            # per side because "reached" is an OR across changed dims; a
            # single multi-filter enrichment would compute the AND.)
            fact_cols = self._fact_cols(src_snap)
            for versions in (pinned, current):
                for i, keys in changed:
                    comps = self._dim_components(
                        spark, versions, fact_cols, dim_filters={i: keys}
                    )
                    bound_sets = [
                        (comp["frame"], lc, dc)
                        for comp in comps
                        if comp["filtered"]
                        for lc, dc in comp["links"]
                    ]
                    scan = self._scan_files(
                        spark,
                        src_snap,
                        self._fact_candidates(src_snap, bound_sets),
                    )
                    g = self._filtered(
                        self._enrich(
                            spark, scan, versions, dim_filters={i: keys}
                        )
                    ).select(*self.group_cols)
                    affected = (
                        g if affected is None else affected.unionByName(g)
                    )
            affected = affected.distinct().persist()
            self._refuse_null_groups(affected, "dimension change feed")
            txn = self._dims_txn_prefix(snap) + "-".join(
                str(v) for v in current
            )
            # the re-pin rides the fold commit (no crash window between
            # the dim recompute and the pin advance; txn-id pin recovery
            # remains the backstop for pre-fusion histories)
            self._recompute_groups(
                spark, affected, cursor, current, txn,
                props_update=self._dim_props(current),
            )
        finally:
            if affected is not None:
                affected.unpersist()
            for _, keys in changed:
                keys.unpersist()
        if self.register_pins:
            # advance the vacuum floors only NOW — after the fold and
            # the re-pin committed — so any failure above leaves the
            # OLD floor protecting the snapshot the view still
            # reflects (a pre-fold advance would strand it, the r12
            # review finding). Explicit values: the floor must name
            # the version the view just pinned, never a concurrent
            # writer's newer one. A crash before this line only leaves
            # the floor lagging (protecting MORE), converged by the
            # next fold; conflict handling lives in _advance_floor.
            for i, _ in changed:
                self._advance_floor(self.dims[i], current[i])
        return current

    def _require_snapshot(self, table: TxLogTable, version: int, what: str):
        """Snapshot ``version`` of ``table``, with the typed error when
        the log cannot resolve it or its files were vacuumed — callers
        depend on reading HISTORY, which only retention guarantees."""
        snap = table.snapshot(version)
        if snap is None:
            raise MatviewWindowUnreadableError(
                f"view at {self.path}: {what} (v{version}) cannot be "
                "resolved from the log — call build() to re-anchor"
            )
        gone = [
            f
            # deletion-vector sidecars are read alongside their data
            # files (and vacuum reclaims superseded ones), so the check
            # must cover both — a missing dv would otherwise erupt as a
            # raw FileNotFoundError inside the scan action
            for f in [*snap.files, *snap.dvs.values()]
            if not os.path.exists(os.path.join(table.path, f))
        ]
        if gone:
            raise MatviewWindowUnreadableError(
                f"view at {self.path}: {what} (v{version}) was vacuumed "
                f"(first missing: {gone[0]}) — call build() to re-anchor"
            )
        return snap

    # ------------------------------------------------- recompute path --
    def _apply_recompute(
        self, spark, ch: DataFrame, to: int, view_snap=None,
        props_update: dict | None = None,
    ) -> None:
        """Affected-group recompute with the fact scan pruned THROUGH the
        dimensions: project the affected groups onto each connected
        dimension component, restrict the component's joined rows to
        them, and turn the restricted rows' fact-side join-key values
        into per-file stats bounds on the fact. ``ch`` arrives already
        enriched (from :meth:`_window_changes`)."""
        versions = self._pinned_dim_versions(
            view_snap if view_snap is not None else self.view.snapshot()
        )
        affected = ch.select(*self.group_cols).distinct().persist()
        try:
            self._refuse_null_groups(affected, "change feed")
            self._recompute_groups(
                spark, affected, to, versions, f"{_TXN_PREFIX}{to}",
                props_update=props_update,
            )
        finally:
            affected.unpersist()

    def _recompute_groups(
        self,
        spark,
        affected: DataFrame,
        to: int,
        versions: list[int],
        txn_id: str,
        props_update: dict | None = None,
    ) -> None:
        """Re-derive ``affected`` groups from the fact snapshot at
        version ``to`` enriched with the dims at ``versions``, pruning
        the fact scan through the dimensions, and merge the fresh state
        in (vanished groups deleted). Shared by the fact-CDF recompute
        path and :meth:`refresh_dimensions`."""
        snap = self.source.snapshot(to)
        fact_cols = self._fact_cols(snap)
        bound_sets: list[tuple[DataFrame, str, str]] = []
        # fact-side group columns bound the fact directly
        fact_g = [g for g in self.group_cols if g in fact_cols]
        for g in fact_g:
            bound_sets.append((affected, g, g))
        for comp in self._dim_components(spark, versions, fact_cols):
            gcols = [g for g in self.group_cols if g in comp["cols"]]
            frame = comp["frame"]
            if gcols:
                frame = frame.join(
                    affected.select(*gcols).distinct(), gcols, "left_semi"
                )
            for lc, dc in comp["links"]:
                bound_sets.append((frame, lc, dc))
        files = self._fact_candidates(snap, bound_sets)
        self.last_recompute_files = (len(files), len(snap.files))
        scan = self._scan_files(spark, snap, files)
        fresh = self._compute_state(
            self._filtered(self._enrich(spark, scan, versions)).join(
                affected, self.group_cols, "left_semi"
            )
        )
        self._merge_fresh_state(
            spark, affected, fresh, txn_id, props_update=props_update
        )

    # -------------------------------------------------- prune plumbing --
    @staticmethod
    def _fact_cols(snap) -> set[str]:
        return {
            f.name
            for f in StructType.fromJson(json.loads(snap.schema_json)).fields
        }

    def _dim_components(
        self,
        spark,
        versions: list[int],
        fact_cols: set[str],
        dim_filters: dict[int, DataFrame] | None = None,
    ) -> list[dict]:
        """The dimensions folded into CONNECTED components (a snowflake
        chain like nation→supplier becomes one joined frame, so
        restrictions propagate jointly), each carrying its fact-side
        join links ``(lc, dc)``. ``dim_filters`` semi-joins a dimension
        to a key set before the fold and marks the component
        ``filtered`` — refresh_dimensions restricts to CHANGED dim
        rows this way."""
        comps: list[dict] = []
        for idx, (d, v) in enumerate(zip(self.dims, versions)):
            dim_df = d.table.read(spark, version=v)
            on_dim = [dc for _, dc in d.on]
            want = (
                d.select if d.select is not None else list(dim_df.columns)
            )
            dim_df = dim_df.select(*dict.fromkeys([*on_dim, *want]))
            filtered = bool(dim_filters) and idx in dim_filters
            if filtered:
                dim_df = dim_df.join(dim_filters[idx], on_dim, "left_semi")
            fact_pairs = [(lc, dc) for lc, dc in d.on if lc in fact_cols]
            dim_pairs = [(lc, dc) for lc, dc in d.on if lc not in fact_cols]
            owners = [
                c
                for c in comps
                if any(lc in c["cols"] for lc, _ in dim_pairs)
            ]
            if owners:
                comp = owners[0]
                cond = None
                for lc, dc in dim_pairs:
                    if lc not in comp["cols"]:
                        continue
                    c = comp["frame"][lc] == dim_df[dc]
                    cond = c if cond is None else cond & c
                comp["frame"] = comp["frame"].join(dim_df, cond, "inner")
                comp["cols"] |= set(dim_df.columns)
                comp["links"] += fact_pairs
                comp["filtered"] = comp["filtered"] or filtered
            else:
                comps.append(
                    {
                        "frame": dim_df,
                        "cols": set(dim_df.columns),
                        "links": list(fact_pairs),
                        "filtered": filtered,
                    }
                )
        return comps

    def _fact_candidates(self, snap, bound_sets) -> list[str]:
        """Fact files that can intersect EVERY bound set (each a
        ``(frame, fact_col, frame_col)`` triple): per-set stats pruning,
        intersected — sound because a contributing fact row must satisfy
        all of them simultaneously."""
        cand: set | None = None
        for frame, lc, dc in bound_sets:
            b = self.source._source_key_bounds(frame.select(dc), [dc])
            files = set(
                self.source._stats_candidates(
                    snap, {lc: b[dc]}, [lc], null_safe=False
                )
            )
            cand = files if cand is None else cand & files
        return sorted(cand) if cand is not None else list(snap.files)

    def _scan_files(self, spark, snap, files: list[str]) -> DataFrame:
        if files:
            return self.source._read_files(spark, snap, files)
        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(snap.schema_json))
        )


# ===================================================================== #
# top-k views: the k best ROWS per group, maintained incrementally      #
# ===================================================================== #


class IncrementalTopKView(IncrementalAggView):
    """The k best ROWS per group — leaderboards, per-key latest-n,
    per-domain best-quality documents — maintained incrementally from
    the source's change feed. Where :class:`IncrementalAggView` stores
    one aggregate row per group, this view stores up to ``k`` ranked
    rows per group (``group_cols`` + ``rank`` 1..k + the ``payload``
    columns + the ranking value), so SELECTing the current leaderboard
    never re-sorts the source.

    - ``order_by``: SQL expression over source columns whose value ranks
      rows (``descending=True`` keeps the k LARGEST). Rows where it
      evaluates NULL are excluded from the view, the same rows a
      ``WHERE ord IS NOT NULL`` top-k query would skip.
    - ``payload``: source columns stored with each ranked row. Ties in
      ``order_by`` break by the payload columns ASCENDING in declared
      order; include a unique key so the ordering is TOTAL per group —
      with ties left ambiguous, an incremental fold and a from-scratch
      rebuild may legitimately keep different (equal-ranked) rows.

    Maintenance mirrors the min/max story, one rank deeper:

    - **insert-only windows** (txlog's metadata proof): the new top-k of
      a group is the top-k of (stored top-k rows ∪ window inserts) —
      rows below the stored horizon can never climb into it when
      nothing was removed — so the refresh re-ranks ONLY the affected
      groups' ≤k stored rows unioned with the window's inserts and
      merges the changed ranks. The source is never read.
    - **windows with deletes/updates**: a removed row may RESURFACE the
      row it displaced, which the stored top-k no longer holds; affected
      groups recompute from the source via the same stats-pruned
      semi-join the aggregate view uses (cost O(|changes| + affected-
      group rows), never O(source)).

    Cursor recovery, the cost-based rebuild fallback, the ``where``
    filter seam, and the unreadable-window errors are all inherited.
    Single-table sources only (compose a join upstream or denormalize;
    the join-view delta-enrichment machinery is aggregate-specific).

    Both refresh modes read the view's OWN stored rows for the affected
    groups; that read is stats-pruned by the view's log-held per-file
    group bounds, so its cost follows the view's LAYOUT: the build's
    hash-shuffled files span every group range (no pruning), while a
    periodic ``view.compact(spark, zorder_by=group_cols)`` (numeric
    keys — zorder buckets by quantile) clusters the
    view so a narrow change window reads O(affected-span) view files —
    the usual OPTIMIZE story, applied to the leaderboard itself
    (``last_view_files`` records scanned/total per refresh).
    """

    def __init__(
        self,
        source: TxLogTable,
        path: str,
        group_cols: list[str],
        order_by: str,
        k: int,
        payload: list[str],
        descending: bool = True,
        order_name: str = "order_value",
        rebuild_ratio: float | None = 1.0,
        where: str | None = None,
        lease_seconds: float | None = None,
    ):
        self._init_common(
            source, path, group_cols, rebuild_ratio, where, lease_seconds
        )
        if not isinstance(k, int) or k < 1:
            raise ValueError(f"k must be a positive int, got {k!r}")
        if not payload:
            raise ValueError(
                "payload must name at least one column (include a "
                "unique key so ties in order_by break deterministically)"
            )
        if not order_by or not str(order_by).strip():
            raise ValueError("order_by must be a SQL expression")
        lowered = {g.lower() for g in group_cols}
        if "rank" in lowered:
            raise ValueError(
                "group column 'rank' collides with the view's rank "
                "output column"
            )
        for c in payload:
            if not _NAME_RE.match(c):
                raise ValueError(
                    f"payload column {c!r} is not a plain SQL identifier"
                )
            if c.lower() == "rank":
                raise ValueError(
                    "payload column 'rank' collides with the view's "
                    "rank output column"
                )
            if c.lower() in lowered:
                raise ValueError(
                    f"payload column {c!r} collides with a group column"
                )
            if c.startswith("_mv_") or c == "_vanish":
                raise ValueError(
                    f"payload column {c!r} collides with the view's "
                    "internal _mv_*/_vanish namespace"
                )
        if len({c.lower() for c in payload}) != len(payload):
            raise ValueError(f"payload names repeat: {payload}")
        if not _NAME_RE.match(order_name) or order_name.startswith("_mv_"):
            raise ValueError(
                f"order_name {order_name!r} is not a plain SQL identifier "
                "outside the internal _mv_* namespace"
            )
        if (
            order_name.lower() in lowered
            or order_name.lower() in {c.lower() for c in payload}
            or order_name.lower() == "rank"
        ):
            raise ValueError(
                f"order_name {order_name!r} collides with a group, "
                "payload, or the rank output column"
            )
        self.order_by = str(order_by)
        self.k = k
        self.payload = list(payload)
        self.descending = bool(descending)
        self.order_name = order_name
        self.aggs = {}  # no aggregate state; satisfies inherited probes
        # (view files scanned, view files in snapshot) of the last
        # refresh's stored-rows read — prune introspection only
        self.last_view_files: tuple[int, int] | None = None

    # ------------------------------------------------------ definition --
    def _definition_json(self) -> str:
        d = {
            "source": self.source.path,
            "group_cols": self.group_cols,
            "topk": {
                "order_by": self.order_by,
                "k": self.k,
                "payload": self.payload,
                "descending": self.descending,
            },
        }
        if self.where is not None:
            d["where"] = self.where
        return json.dumps(d, sort_keys=True)

    @property
    def additive(self) -> bool:
        # truncation is not invertible: a delete below rank k is
        # unobservable in the stored state, so nothing about a top-k
        # folds additively under general windows. (all() over the empty
        # aggs dict would otherwise answer True here and route deletes
        # through the insert-only fold.)
        return False

    def alter(
        self,
        spark: SparkSession,
        add_aggs: dict | None = None,
        drop_aggs=None,
        rename_aggs: dict | None = None,
    ):
        """Typed refusal: a top-k view stores RANKED ROWS, not
        aggregate state — there is no aggregate surface to extend or
        shrink. Changing ``k``/``order_by``/``payload`` is a different
        definition; construct the new view and ``build()`` it."""
        raise MatviewDefinitionError(
            f"view at {self.path}: top-k views have no aggregate "
            "surface alter() could extend or drop; a changed "
            "ranking/payload is a new definition — build() a new view"
        )

    # ----------------------------------------------------- state shape --
    def _candidate_rows(self, df: DataFrame) -> DataFrame:
        """Source-shaped (or CDF-shaped) rows projected to ranking
        candidates: group keys + payload + the evaluated order value,
        NULL order values excluded (change-feed metadata columns fall
        away here)."""
        return (
            df.withColumn("_mv_ord", F.expr(self.order_by))
            .filter(F.col("_mv_ord").isNotNull())
            .select(*self.group_cols, *self.payload, "_mv_ord")
        )

    def _rank(self, cand: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        ordc = (
            F.col("_mv_ord").desc()
            if self.descending
            else F.col("_mv_ord").asc()
        )
        w = Window.partitionBy(*self.group_cols).orderBy(
            ordc, *[F.col(c).asc() for c in self.payload]
        )
        return (
            cand.withColumn("_mv_rank", F.row_number().over(w))
            .filter(F.col("_mv_rank") <= F.lit(self.k))
        )

    def _compute_state(self, src: DataFrame) -> DataFrame:
        return self._rank(self._candidate_rows(src))

    def _state_cols(self) -> list[str]:
        return [*self.payload, "_mv_ord"]

    # ------------------------------------------------ insert-only fold --
    def _apply_additive_delta(
        self, spark, ch: DataFrame, txn_id: str,
        props_update: dict | None = None,
    ) -> None:
        """Reached only under the txlog's insert-only window proof
        (``additive`` is False): re-rank stored rows ∪ inserted rows
        within the affected groups — a bounded frame (≤k stored rows per
        group plus the window), never the source."""
        delta = self._candidate_rows(ch)
        affected = delta.select(*self.group_cols).distinct().persist()
        stored = None
        try:
            self._refuse_null_groups(affected, "change feed")
            # ONE pruned read serves both the re-rank (rank dropped) and
            # the merge tail's vanished/changed anti-joins
            stored = (
                self._read_view_groups(spark, affected)
                .select(
                    *self.group_cols, "_mv_rank", *self._state_cols()
                )
                .persist()
            )
            fresh = self._rank(
                stored.drop("_mv_rank").unionByName(delta)
            )
            self._merge_fresh_state(
                spark, affected, fresh, txn_id, stored=stored,
                props_update=props_update,
            )
        finally:
            if stored is not None:
                stored.unpersist()
            affected.unpersist()

    def _read_view_groups(
        self, spark, affected: DataFrame
    ) -> DataFrame:
        """The view's stored rows for the affected groups, with the scan
        STATS-PRUNED to the affected keys' bounds before the exact
        semi-join — the view is itself a txlog table with log-held
        per-file min/max, so a leaderboard over millions of groups reads
        O(affected-span) view files per refresh, not the whole view (on
        a group-clustered layout; unclustered degrades to the semi-join
        alone, same honest bound as the source-side prune)."""
        scan, self.last_view_files = self._pruned_scan(
            spark, self.view, self.view.version(), affected
        )
        return scan.join(affected, self.group_cols, "left_semi")

    # -------------------------------------------------- merge (by rank) --
    def _merge_fresh_state(
        self,
        spark,
        affected: DataFrame,
        fresh: DataFrame,
        txn_id: str,
        stored: DataFrame | None = None,
        bounds: dict | None = None,
        props_update: dict | None = None,
    ) -> None:
        """Replace the affected groups' ranked rows. Keyed on
        (group, rank): rank r gets the row now holding it, ranks past a
        group's new depth (shrunk or vanished groups) are deleted — one
        conditional MERGE, same commit shape as the aggregate view.
        ``stored`` (the affected groups' current view rows) is passed
        through by the fold, which already read it; the recompute path
        leaves it None and the pruned read happens here."""
        keys = [*self.group_cols, "_mv_rank"]
        state_cols = self._state_cols()
        own = stored is None
        if own:
            stored = (
                self._read_view_groups(spark, affected)
                .select(*keys, *state_cols)
                .persist()
            )
        vanished = stored.select(*keys).join(fresh, keys, "left_anti")
        # ranks whose content is byte-identical to the stored row need no
        # rewrite — drop them so the MERGE's touched-file set tracks the
        # ranks that genuinely moved (an insert below every stored
        # horizon otherwise rewrites the whole affected leaderboard).
        # NULL payload values fail the equi-join and conservatively count
        # as changed — an extra rewrite, never a missed one.
        changed = fresh.join(stored, [*keys, *state_cols], "left_anti")
        src = changed.withColumn("_vanish", F.lit(0)).unionByName(
            vanished.withColumn("_vanish", F.lit(1)),
            allowMissingColumns=True,
        )
        try:
            self.view.merge(
                spark,
                src,
                keys=keys,
                clauses=[
                    when_matched_delete(condition="s._vanish = 1"),
                    when_matched_update(
                        set={c: f"s.{c}" for c in state_cols}
                    ),
                    when_not_matched_insert(
                        condition="_vanish = 0",  # bare source scope
                        values={
                            **{g: f"s.{g}" for g in self.group_cols},
                            "_mv_rank": "s._mv_rank",
                            **{c: f"s.{c}" for c in state_cols},
                        },
                    ),
                ],
                txn_id=txn_id,
                # changed ranks (unique per group by _rank) ∪ vanished
                # ranks (disjoint from changed by anti-join) — unique on
                # (group, rank) by construction. `bounds` covers only
                # the group columns, not _mv_rank, so the merge computes
                # its own full-key bounds.
                source_keys_unique=True,
                properties_update=props_update,
            )
        finally:
            if own:
                stored.unpersist()

    # ----------------------------------------------------------- read --
    def read(self, spark: SparkSession) -> DataFrame:
        """The leaderboard: group columns, ``rank`` (1 = best), the
        ranking value under ``order_name``, then the payload columns."""
        snap = self.view.snapshot()
        if snap is None:
            raise FileNotFoundError(
                f"view at {self.path} has no committed build; call build()"
            )
        self._check_definition(snap)
        return self.view.read(spark).select(
            *self.group_cols,
            F.col("_mv_rank").alias("rank"),
            F.col("_mv_ord").alias(self.order_name),
            *self.payload,
        )


# ===================================================================== #
# union views: aggregates over a fact SHARDED across several tables     #
# ===================================================================== #

_UNION_EPOCH_KEY = "matview.union.epoch"
# half-finished shard-membership changes (attach_shard / detach_shard):
# JSON {"path", "version", "index"} — set before the fold, cleared by
# the atomic definition commit; a pending view refuses refresh()/read()
# until the SAME operation is re-run to completion (or build() supersedes)
_ATTACH_PENDING_KEY = "matview.union.attach.pending"
_DETACH_PENDING_KEY = "matview.union.detach.pending"


class IncrementalUnionAggView(IncrementalAggView):
    """A GROUP-BY aggregate view over the UNION ALL of several txlog
    tables — the sharded-fact shape (per-region / per-tenant / per-year
    physical tables feeding one logical rollup). Maintained from EACH
    shard's change feed under a version-VECTOR cursor: a refresh folds
    only the shards that moved, and a group whose rows span shards is
    still maintained exactly (the additive deltas sum across shards;
    the recompute path re-reads the group from every shard).

    Same aggregate surface and maintenance modes as the single-source
    view: additive for count/sum/avg, insert-only fold for min/max/HLL
    when EVERY moved shard's window is insert-only (one non-append
    shard demotes the whole refresh to recompute — correctness beats
    optimism), affected-group recompute otherwise, with each shard's
    scan independently stats-pruned to the affected keys' bounds.
    Exactly-once: the refresh MERGE carries the target version vector
    in its txn id (``matview.cursor.u<epoch>.<v0>-<v1>-…``), epoch-
    scoped exactly like the join view's dimension ids, so a crash
    between the merge and the property advance replays as a committed
    no-op and a rebuild can never be overridden by a stale vector.

    Shards must share a schema (``unionByName`` fails loudly) and every
    shard needs ``cdf.enabled=true`` before the DML a refresh must see.
    ``last_recompute_files`` sums (scanned, total) across shards.

    Membership EVOLVES in place (r13): :meth:`attach_shard` folds a new
    shard's snapshot as one insert-only window and extends the
    vector/definition/epoch atomically; :meth:`detach_shard` subtracts
    a shard's applied contribution (additive, or affected-group
    recompute from the remainder). Both bracket the fold with a pending
    property so a crash anywhere resumes exactly-once.
    """

    _SRC_KEY = "matview.union.src.{i}.version"

    def __init__(
        self,
        sources: list[TxLogTable],
        path: str,
        group_cols: list[str],
        aggs: dict[str, tuple[str, str]],
        rebuild_ratio: float | None = 1.0,
        where: str | None = None,
        lease_seconds: float | None = None,
    ):
        if len(sources) < 2:
            raise ValueError(
                "sources must name at least two tables (use "
                "IncrementalAggView for a single source)"
            )
        paths = [t.path for t in sources]
        if len(set(paths)) != len(paths):
            raise ValueError(f"duplicate source paths: {paths}")
        super().__init__(
            sources[0], path, group_cols, aggs, rebuild_ratio, where,
            lease_seconds,
        )
        self.sources = list(sources)

    # ------------------------------------------------------ definition --
    def _definition_json(self) -> str:
        return self._definition_json_for(self.sources)

    def _definition_json_for(self, sources: list[TxLogTable]) -> str:
        """The definition for an explicit shard membership — attach /
        detach validate the stored definition against the PRE-change
        membership while ``self.sources`` may already reflect either
        side (resume after a crash)."""
        d = {
            "sources": [t.path for t in sources],
            "group_cols": self.group_cols,
            "aggs": {k: list(v) for k, v in self.aggs.items()},
        }
        if self.where is not None:
            d["where"] = self.where
        return json.dumps(d, sort_keys=True)

    def _check_definition(self, snap) -> None:
        for key, what in (
            (_ATTACH_PENDING_KEY, "attach_shard"),
            (_DETACH_PENDING_KEY, "detach_shard"),
        ):
            p = snap.properties.get(key)
            if p:
                try:
                    shard = json.loads(p)["path"]
                except (ValueError, KeyError, TypeError):
                    shard = f"<corrupted pending record: {p!r}>"
                raise MatviewDefinitionError(
                    f"view at {self.path} has an interrupted {what} of "
                    f"{shard}; re-run {what} with that table to "
                    "complete it (or build() / recover() to supersede)"
                )
        super()._check_definition(snap)

    # --------------------------------------------------- vector cursor --
    def _src_props(self, versions: list[int]) -> dict:
        return {
            self._SRC_KEY.format(i=i): str(v)
            for i, v in enumerate(versions)
        }

    def _txn_prefix(self, snap) -> str:
        epoch = snap.properties.get(_UNION_EPOCH_KEY, "0")
        return f"{_TXN_PREFIX}u{epoch}."

    def _cursor_vec(self, snap, sources=None) -> list[int]:
        """Applied-through version per shard: the pinned properties,
        raised componentwise by committed refresh txn ids of the CURRENT
        build epoch whose property advance was lost to a crash.
        ``sources`` overrides the membership the vector is read for
        (attach/detach resume with the PRE-change membership)."""
        sources = self.sources if sources is None else sources
        out = []
        for i, t in enumerate(sources):
            key = self._SRC_KEY.format(i=i)
            if key not in snap.properties:
                raise MatviewDefinitionError(
                    f"view at {self.path} has no pinned version for "
                    f"source {i} ({t.path}); re-run build()"
                )
            out.append(int(snap.properties[key]))
        prefix = self._txn_prefix(snap)
        for t in snap.txn_ids:
            if not t.startswith(prefix):
                continue
            parts = t[len(prefix):].split("-")
            if len(parts) != len(out):
                continue
            try:
                vec = [int(p) for p in parts]
            except ValueError:
                continue
            out = [max(a, b) for a, b in zip(out, vec)]
        return out

    def _heal_cursor(self, snap, vec: list[int], sources=None) -> None:
        """Persist txn-recovered pins before the ids age out of the
        snapshot at checkpoint roll — the union mirror of the join
        view's dim-pin healing."""
        n = len(self.sources if sources is None else sources)
        stored = [
            int(snap.properties[self._SRC_KEY.format(i=i)])
            for i in range(n)
        ]
        if stored != vec:
            self.view.alter_properties(self._src_props(vec))

    # --------------------------------------------------------- actions --
    def build(self, spark: SparkSession) -> list[int]:
        """Aggregate the union of the CURRENT shard snapshots; pin the
        version vector; bump the epoch so pre-rebuild txn ids stop
        participating in cursor recovery. Returns the pinned vector."""
        versions = []
        for t in self.sources:
            v = t.version()
            if v < 0:
                raise FileNotFoundError(f"source {t.path} is empty")
            versions.append(v)
        src = None
        for t, v in zip(self.sources, versions):
            fr = t.read(spark, version=v)
            src = fr if src is None else src.unionByName(fr)
        prev = self.view.snapshot()
        epoch = int(
            (prev.properties if prev else {}).get(_UNION_EPOCH_KEY, 0)
        )
        # a rebuild with FEWER sources than the previous membership
        # (detach's cost fallback, or a reconstructed smaller view)
        # must drop the stale higher-index pins — a leftover
        # matview.union.src.{i}.version would misreport the vector
        # length to anything reading the pin properties
        stale: dict = {}
        for k in (prev.properties if prev else {}):
            if not k.startswith("matview.union.src."):
                continue
            try:
                idx = int(k.split(".")[3])
            except (IndexError, ValueError):
                continue
            if idx >= len(self.sources):
                stale[k] = None
        self._build_state(
            spark,
            versions[0],
            src,
            {
                **stale,
                **self._src_props(versions),
                _UNION_EPOCH_KEY: str(epoch + 1),
                # a rebuild supersedes any half-finished membership
                # change: the state and definition it publishes are
                # self-consistent for self.sources as constructed
                _ATTACH_PENDING_KEY: None,
                _DETACH_PENDING_KEY: None,
            },
        )
        return versions

    def refresh(self, spark: SparkSession) -> list[int]:
        """Advance the view to every shard's current version. Folds
        only the moved shards' CDF windows; no-op when nothing moved.
        Returns the version vector now reflected."""
        snap = self.view.snapshot()
        if snap is None:
            raise FileNotFoundError(
                f"view at {self.path} has no committed build; call build()"
            )
        self._check_definition(snap)
        self._acquire_lease()
        frm = self._cursor_vec(snap)
        self._heal_cursor(snap, frm)
        to = [t.version() for t in self.sources]
        for t, f, c in zip(self.sources, frm, to):
            if c < f:
                raise MatviewWindowUnreadableError(
                    f"view at {self.path}: source {t.path} REWOUND "
                    f"(cursor v{f}, now v{c} — a restore?); its forward "
                    "diff is gone — call build() to re-anchor"
                )
        if to == frm:
            return frm
        moved = [
            (t, f, c)
            for t, f, c in zip(self.sources, frm, to)
            if c > f
        ]
        if self._union_wants_rebuild(moved, to):
            # build() re-reads current versions itself: a shard advancing
            # between our vector read and the rebuild is pinned at its
            # NEWER version, and the returned vector reflects that
            return self.build(spark)
        # per-shard schema contract: each moved shard's window must
        # still support the definition at the view's anchored types —
        # this also catches SHARD DRIFT beyond unionByName's reach
        # (same column names, diverged types)
        for t, f, c in moved:
            self._check_window_schema(spark, f, c, snap, table=t)
        ch = None
        try:
            for t, f, c in moved:
                w = self._filtered(t.read_cdf(spark, f, c))
                # allowMissingColumns: the schema check above proved
                # every shard window compatible with the DEFINITION —
                # a column one shard added (and no shard's definition
                # input reads) may simply be absent on the others
                ch = (
                    w
                    if ch is None
                    else ch.unionByName(w, allowMissingColumns=True)
                )
        except (ValueError, FileNotFoundError) as e:
            raise MatviewWindowUnreadableError(
                f"view at {self.path}: a shard's CDF window cannot be "
                f"replayed ({e}); the view was NOT advanced — call "
                "build() to re-anchor it from the current snapshots"
            ) from e
        txn = self._txn_prefix(snap) + "-".join(str(v) for v in to)
        # the vector advance rides the fold commit (one commit per
        # refresh; the txn-id vector recovery in _cursor_vec remains the
        # backstop for pre-fusion histories)
        props = self._src_props(to)
        # proof evaluated lazily: an additive view never pays the
        # per-shard commit-log walk (mirrors the single-source routing)
        if self.additive or (
            self._insert_only_foldable
            and all(t.window_is_insert_only(f, c) for t, f, c in moved)
        ):
            self._apply_additive_delta(spark, ch, txn, props_update=props)
        else:
            self._apply_union_recompute(
                spark, ch, to, txn, props_update=props
            )
        return to

    # ------------------------------------------------- refresh costing --
    def _union_wants_rebuild(self, moved, to: list[int]) -> bool:
        """Cost decision summed across shards: total window bytes vs
        total snapshot bytes at the target vector (metadata-only, same
        per-op accounting as the single-source ``_window_bytes``)."""
        if self.rebuild_ratio is None:
            return False
        win = sum(
            self._window_bytes(f, c, table=t) for t, f, c in moved
        )
        if win == 0:
            return False
        src = sum(
            self._snapshot_bytes(t, v)
            for t, v in zip(self.sources, to)
        )
        return win >= self.rebuild_ratio * src

    # ------------------------------------------------- recompute path --
    def _apply_union_recompute(
        self, spark, ch: DataFrame, to: list[int], txn_id: str,
        sources: list[TxLogTable] | None = None,
        props_update: dict | None = None,
    ) -> None:
        """Affected-group recompute across EVERY shard: a group's rows
        may live in shards whose windows didn't move, so all shards are
        scanned — each independently stats-pruned to the affected keys'
        bounds (sum recorded in ``last_recompute_files``). ``sources``
        overrides the membership scanned (attach folds over old+new
        before ``self.sources`` is committed; detach over the
        remainder)."""
        sources = self.sources if sources is None else sources
        affected = ch.select(*self.group_cols).distinct().persist()
        try:
            scan = None
            scanned = total = 0
            # ONE fused probe job: the affected-key bounds (computed
            # once, reused by every shard's prune AND the merge tail)
            # double as the NULL-group refusal via their per-key null
            # counts
            bounds = sources[0]._source_key_bounds(
                affected, list(self.group_cols)
            )
            if any(bounds[g]["nulls"] for g in self.group_cols):
                raise ValueError(self._null_group_msg("change feed"))
            for t, v in zip(sources, to):
                s, (c, n) = self._pruned_scan(
                    spark, t, v, affected, bounds=bounds
                )
                scanned += c
                total += n
                scan = s if scan is None else scan.unionByName(s)
            self.last_recompute_files = (scanned, total)
            fresh = self._compute_state(
                self._filtered(scan).join(
                    affected, self.group_cols, "left_semi"
                )
            )
            self._merge_fresh_state(
                spark, affected, fresh, txn_id,
                bounds=bounds, props_update=props_update,
            )
        finally:
            affected.unpersist()

    # ------------------------------------------- definition evolution --
    def _alter_cursor_props(self, snap):
        """Drop-only alter() for the union view: re-assert the healed
        version vector, return it."""
        vec = self._cursor_vec(snap)
        return {_CURSOR_KEY: str(vec[0]), **self._src_props(vec)}, vec

    def _alter_anchor(self, spark: SparkSession, snap):
        """alter() anchor for the union view: every shard read at its
        applied vector component (healed first), so the new aggregates'
        backfill reflects exactly the rows the stored state does."""
        vec = self._cursor_vec(snap)
        self._heal_cursor(snap, vec)
        src = None
        for t, v in zip(self.sources, vec):
            fr = t.read(spark, version=v)
            src = fr if src is None else src.unionByName(fr)
        return (
            src,
            {_CURSOR_KEY: str(vec[0]), **self._src_props(vec)},
            vec,
        )

    # ------------------------------------------- membership evolution --
    def _check_shard_shape(
        self, spark, table: TxLogTable, v: int, anchor_table: TxLogTable,
        anchor_v: int, snap,
    ) -> None:
        """Refuse attaching a shard whose schema does not support the
        definition at the SAME types as the anchored membership — the
        per-shard drift contract refresh() enforces on windows, applied
        once to the whole incoming snapshot. Analysis-only (two empty-
        frame probes); an unresolvable snapshot skips the probe and
        lets the read below fail loudly instead."""
        from pyspark.errors import AnalysisException

        a = anchor_table.snapshot(anchor_v)
        s = table.snapshot(v)
        if a is None or s is None:
            return
        want = self._definition_shape(
            spark, StructType.fromJson(json.loads(a.schema_json)), snap
        )
        try:
            got = self._definition_shape(
                spark, StructType.fromJson(json.loads(s.schema_json)), snap
            )
        except (AnalysisException, ValueError) as err:
            raise MatviewSourceSchemaError(
                f"view at {self.path}: the definition does not resolve "
                f"against attaching shard {table.path} v{v}: {err}"
            ) from err
        if got != want:
            diff = sorted(
                k.removeprefix("_in_")
                for k in {**want, **got}
                if want.get(k) != got.get(k)
            )
            raise MatviewSourceSchemaError(
                f"view at {self.path}: attaching shard {table.path} "
                f"v{v} RETYPES definition input(s) {diff} relative to "
                f"the anchored membership ({anchor_table.path} "
                f"v{anchor_v}); align the shard's schema first"
            )

    def attach_shard(
        self, spark: SparkSession, table: TxLogTable
    ) -> list[int]:
        """Extend the view's shard membership IN PLACE — the operation
        a partitioned lake performs routinely (a new region / tenant /
        year table joins an existing rollup) — without rebuilding the
        state the existing shards already paid for.

        The new shard's CURRENT snapshot is folded as one insert-only
        window (additive deltas for count/sum/avg; monotone fold /
        sketch union for min/max/approx_distinct — the same proof an
        insert-only refresh window carries; a ``("sql", …)`` aggregate
        recomputes its affected groups across old+new shards), then the
        definition, the extended version vector, and a new epoch commit
        atomically. Future ``refresh()`` calls maintain the shard from
        its own CDF like any other. The refresh() cost contract applies
        to membership too: when the incoming shard's bytes reach
        ``rebuild_ratio`` × the existing membership's, the fold cannot
        beat one clean rescan and attach falls back to ``build()`` on
        the extended membership (``rebuild_ratio=None`` pins the fold).

        Crash contract (single maintainer, like all view maintenance):
        a ``matview.union.attach.pending`` property brackets the fold —
        an interrupted attach refuses refresh()/read() with a typed
        error until ``attach_shard`` is re-run WITH THE SAME TABLE
        (the fold replays as a txn-id no-op and the commit completes).
        ``recover()`` RESUMES the attach from the recorded path (it
        never discards the committed fold), falling back to ``build()``
        only when the resume itself is impossible. Returns the new
        version vector (the attached shard last)."""
        snap = self.view.snapshot()
        if snap is None:
            raise FileNotFoundError(
                f"view at {self.path} has no committed build; call build()"
            )
        self._acquire_lease()
        if snap.properties.get(_PENDING_KEY) == "true":
            raise MatviewDefinitionError(
                f"view at {self.path} has an interrupted rebuild "
                "(matview.rebuild.pending); re-run build()"
            )
        if snap.properties.get(_DETACH_PENDING_KEY):
            info = json.loads(snap.properties[_DETACH_PENDING_KEY])
            raise MatviewDefinitionError(
                f"view at {self.path} has an interrupted detach_shard "
                f"of {info['path']}; complete it first (or build())"
            )
        pend = snap.properties.get(_ATTACH_PENDING_KEY)
        pend = json.loads(pend) if pend else None
        if pend is not None and pend["path"] != table.path:
            raise MatviewDefinitionError(
                f"view at {self.path} has an interrupted attach_shard "
                f"of {pend['path']}; re-run attach_shard with that "
                "table first (or build())"
            )
        old = [t for t in self.sources if t.path != table.path]
        if pend is None and len(old) != len(self.sources):
            raise ValueError(
                f"{table.path} is already a source of this view"
            )
        stored = snap.properties.get(_DEF_KEY)
        if pend is None and stored == self._definition_json_for(
            [*old, table]
        ):
            # a previous attach of this shard COMPLETED (the fold commit
            # carries the membership atomically, so there is no partial
            # post-fold state) — idempotent success, echo the vector
            self.sources = [*old, table]
            return self._cursor_vec(snap, sources=self.sources)
        if stored != self._definition_json_for(old):
            raise MatviewDefinitionError(
                f"view at {self.path} was built from a different "
                "definition than attach_shard's pre-attach membership "
                f"(already attached? stored={stored}); construct the "
                "view with the membership the state reflects"
            )
        vec = self._cursor_vec(snap, sources=old)
        self._heal_cursor(snap, vec, sources=old)
        if pend is not None:
            v = int(pend["version"])
        else:
            v = table.version()
            if v < 0:
                raise FileNotFoundError(f"shard {table.path} is empty")
        # drift contract BEFORE anything is written
        self._check_shard_shape(spark, table, v, old[0], vec[0], snap)
        if pend is None and self.rebuild_ratio is not None:
            # cost-based fallback, the refresh() contract applied to
            # membership: the fold reads the NEW shard and merges; the
            # rebuild reads EVERYTHING. When the new shard's bytes
            # reach rebuild_ratio × the existing membership's, the fold
            # cannot beat one clean rescan — build() on the extended
            # membership (it pins current versions and clears pendings
            # itself). A RESUME never reroutes: its fold may already be
            # committed, making completion strictly cheapest.
            new_bytes = self._snapshot_bytes(table, v)
            old_bytes = sum(
                self._snapshot_bytes(t, pv) for t, pv in zip(old, vec)
            )
            if new_bytes >= self.rebuild_ratio * max(old_bytes, 1):
                prev_sources = self.sources
                self.sources = [*old, table]
                try:
                    return self.build(spark)
                except BaseException:
                    # a failed rebuild committed nothing (its own
                    # pending bracket covers the crash case) — restore
                    # the handle so a retry of attach_shard doesn't
                    # misread the shard as already attached
                    self.sources = prev_sources
                    raise
        # construct the shard read BEFORE the pending marker lands: a
        # metadata-detectable unreadable snapshot (vacuumed, missing log)
        # must refuse with the view UNTOUCHED — wedging refresh()/read()
        # behind the pending contract for a failure that never wrote
        # anything would force a needless resume/build. The pending
        # bracket below still covers failures only the fold JOB discovers.
        try:
            full = table.read(spark, version=v)
        except (ValueError, FileNotFoundError) as e:
            raise MatviewWindowUnreadableError(
                f"view at {self.path}: attaching shard {table.path} "
                f"snapshot v{v} cannot be read ({e}); the view was NOT "
                "touched — re-run attach_shard when it is readable, or "
                "construct the view with the full membership and build()"
            ) from e
        if pend is None:
            self.view.alter_properties(
                {
                    _ATTACH_PENDING_KEY: json.dumps(
                        {
                            "path": table.path,
                            "version": v,
                            "index": len(old),
                        }
                    )
                }
            )
        txn = f"{self._txn_prefix(snap)}attach.{len(old)}.{v}"
        ch = self._filtered(full).withColumn(
            "_change_type", F.lit("insert")
        )
        # the membership commit (definition, extended vector, epoch
        # bump, pending clear) rides the fold commit ATOMICALLY: the
        # attach protocol has exactly two commits (pending, fold) and
        # NO window in which the fold landed but the membership didn't
        epoch = int(snap.properties.get(_UNION_EPOCH_KEY, 0))
        props = {
            _DEF_KEY: self._definition_json_for([*old, table]),
            **self._src_props([*vec, v]),
            _CURSOR_KEY: str(vec[0]),
            _UNION_EPOCH_KEY: str(epoch + 1),
            _ATTACH_PENDING_KEY: None,
        }
        if self._insert_only_foldable:
            # the attach window is PURE INSERTS: min/max fold
            # monotonically, sketches union — the insert-only proof
            # holds by construction, no commit-log walk needed
            self._apply_additive_delta(spark, ch, txn, props_update=props)
        else:
            self._apply_union_recompute(
                spark, ch, [*vec, v], txn, sources=[*old, table],
                props_update=props,
            )
        if self.view.snapshot().properties.get(_ATTACH_PENDING_KEY):
            # pre-fusion history: the interrupted fold had already
            # committed WITHOUT the membership rider (r13 protocol), so
            # the replay above was a txn no-op and the membership still
            # needs its own commit — the old completion path
            self.view.alter_properties(props)
        self.sources = [*old, table]
        return [*vec, v]

    def detach_shard(
        self, spark: SparkSession, table: TxLogTable
    ) -> list[int]:
        """Remove a shard from the view's membership IN PLACE,
        subtracting exactly the contribution the state holds for it —
        the shard's snapshot AT ITS APPLIED VECTOR COMPONENT replayed
        as one all-delete window (additive subtraction for
        count/sum/avg; affected-group recompute from the REMAINING
        shards otherwise, since a removed extreme may resurface a value
        only another shard holds). The shard's applied snapshot must
        still be readable (don't vacuum a shard past its pinned version
        before detaching it); when it is not, construct the view with
        the remaining membership and ``build()``.

        Crash contract mirrors :meth:`attach_shard`
        (``matview.union.detach.pending`` brackets the fold; re-run
        with the same table — or let ``recover()`` resume it — to
        complete; ``build()`` supersedes). Detaching
        below two shards is refused — rebuild the survivor as an
        :class:`IncrementalAggView`. The attach cost fallback mirrors
        here: a shard as big as the remaining membership rebuilds from
        the remainder instead of subtracting. Returns the remaining
        version vector."""
        snap = self.view.snapshot()
        if snap is None:
            raise FileNotFoundError(
                f"view at {self.path} has no committed build; call build()"
            )
        self._acquire_lease()
        if snap.properties.get(_PENDING_KEY) == "true":
            raise MatviewDefinitionError(
                f"view at {self.path} has an interrupted rebuild "
                "(matview.rebuild.pending); re-run build()"
            )
        if snap.properties.get(_ATTACH_PENDING_KEY):
            info = json.loads(snap.properties[_ATTACH_PENDING_KEY])
            raise MatviewDefinitionError(
                f"view at {self.path} has an interrupted attach_shard "
                f"of {info['path']}; complete it first (or build())"
            )
        pend = snap.properties.get(_DETACH_PENDING_KEY)
        pend = json.loads(pend) if pend else None
        if pend is not None and pend["path"] != table.path:
            raise MatviewDefinitionError(
                f"view at {self.path} has an interrupted detach_shard "
                f"of {pend['path']}; re-run detach_shard with that "
                "table first (or build())"
            )
        paths = [t.path for t in self.sources]
        if table.path in paths:
            old = list(self.sources)
        elif pend is not None:
            # resume on an object already holding the post-detach list
            old = list(self.sources)
            old.insert(int(pend["index"]), table)
        else:
            raise ValueError(
                f"{table.path} is not a source of this view"
            )
        if len(old) <= 2:
            raise ValueError(
                "detaching would leave a single-source view; construct "
                "an IncrementalAggView over the remaining shard and "
                "build() it instead"
            )
        stored = snap.properties.get(_DEF_KEY)
        if pend is None and stored == self._definition_json_for(
            [t for t in old if t.path != table.path]
        ):
            # a previous detach of this shard COMPLETED (atomic fold
            # commit) — idempotent success, echo the remaining vector
            self.sources = [t for t in old if t.path != table.path]
            return self._cursor_vec(snap, sources=self.sources)
        if stored != self._definition_json_for(old):
            raise MatviewDefinitionError(
                f"view at {self.path} was built from a different "
                "definition than detach_shard's pre-detach membership "
                f"(already detached? stored={stored})"
            )
        i = [t.path for t in old].index(table.path)
        vec = self._cursor_vec(snap, sources=old)
        self._heal_cursor(snap, vec, sources=old)
        v = int(pend["version"]) if pend is not None else vec[i]
        if pend is None and self.rebuild_ratio is not None:
            # mirror of attach's cost fallback: subtracting a shard as
            # big as the remaining membership cannot beat rescanning
            # the remainder
            det_bytes = self._snapshot_bytes(table, v)
            rem_bytes = sum(
                self._snapshot_bytes(t, pv)
                for j, (t, pv) in enumerate(zip(old, vec))
                if j != i
            )
            if det_bytes >= self.rebuild_ratio * max(rem_bytes, 1):
                prev_sources = self.sources
                self.sources = [
                    t for t in old if t.path != table.path
                ]
                try:
                    return self.build(spark)
                except BaseException:
                    self.sources = prev_sources
                    raise
        # read construction BEFORE the pending marker, mirroring attach:
        # an unreadable applied snapshot refuses with the view untouched
        try:
            full = table.read(spark, version=v)
        except (ValueError, FileNotFoundError) as e:
            raise MatviewWindowUnreadableError(
                f"view at {self.path}: detaching shard {table.path}'s "
                f"applied snapshot v{v} cannot be read ({e}) — its "
                "contribution cannot be subtracted; the view was NOT "
                "touched; construct the view with the remaining shards "
                "and build()"
            ) from e
        if pend is None:
            self.view.alter_properties(
                {
                    _DETACH_PENDING_KEY: json.dumps(
                        {"path": table.path, "version": v, "index": i}
                    )
                }
            )
        txn = f"{self._txn_prefix(snap)}detach.{i}.{v}"
        ch = self._filtered(full).withColumn(
            "_change_type", F.lit("delete")
        )
        remaining = [t for t in old if t.path != table.path]
        rvec = [x for j, x in enumerate(vec) if j != i]
        # membership commit rides the fold commit atomically (see
        # attach_shard) — two commits total, no partial post-fold state
        epoch = int(snap.properties.get(_UNION_EPOCH_KEY, 0))
        props = {
            _DEF_KEY: self._definition_json_for(remaining),
            **self._src_props(rvec),
            _CURSOR_KEY: str(rvec[0]),
            _UNION_EPOCH_KEY: str(epoch + 1),
            _DETACH_PENDING_KEY: None,
            # drop the now-stale trailing pin
            self._SRC_KEY.format(i=len(old) - 1): None,
        }
        if self.additive:
            self._apply_additive_delta(spark, ch, txn, props_update=props)
        else:
            self._apply_union_recompute(
                spark, ch, rvec, txn, sources=remaining,
                props_update=props,
            )
        if self.view.snapshot().properties.get(_DETACH_PENDING_KEY):
            # pre-fusion history: fold committed without the rider (r13
            # protocol); complete with the old membership commit
            self.view.alter_properties(props)
        self.sources = remaining
        return rvec

    def recover(self, spark: SparkSession):
        """Union-view remediation: a half-finished attach/detach is
        RESUMED first — the pending property records the shard's path,
        so the handle is reconstructable and the in-flight membership
        change completes exactly-once (an unattended ``recover()`` —
        e.g. a stream's ``views_recover=True`` batch hook — must never
        silently discard a committed fold with a rebuild). Only when
        the resume itself is impossible (unreadable pinned snapshot, a
        definition that no longer matches the pre-change membership)
        does it fall back to ``build()``, the documented supersede.
        Everything else walks the base ladder."""
        snap = self.view.snapshot()
        props = snap.properties if snap is not None else {}
        for key, resume in (
            (_ATTACH_PENDING_KEY, self.attach_shard),
            (_DETACH_PENDING_KEY, self.detach_shard),
        ):
            p = props.get(key)
            if not p:
                continue
            try:
                # parse inside the guard: a corrupted pending property
                # (truncated JSON, missing path) must route to the
                # build() supersede, not wedge an unattended stream's
                # recover hook with a raw JSONDecodeError every batch
                info = json.loads(p)
                resume(spark, TxLogTable(info["path"]))
            except (
                MatviewWindowUnreadableError,
                MatviewDefinitionError,
                FileNotFoundError,
                ValueError,  # covers JSONDecodeError
                KeyError,
                TypeError,
            ):
                return self.build(spark)
            # the post-resume refresh stays OUTSIDE the guard: a
            # data-shaped error it raises (NULL group key) needs an
            # upstream fix — routing it into build() would burn a full
            # recompute only to fail with the same error, every batch
            # under a stream's views_recover hook
            return self.refresh(spark)
        # membership ADOPTION: a completed attach/detach this handle
        # never saw leaves no pending to resume (the membership commit
        # rides the fold atomically) — the handle is merely STALE. When
        # the stored definition differs from ours ONLY in the shard
        # list, adopt it and refresh; falling through to the base
        # ladder's build() would re-anchor on the stale list and
        # silently DISCARD the committed membership change.
        stored = props.get(_DEF_KEY)
        if stored is not None and stored != self._definition_json():
            try:
                d = json.loads(stored)
            except ValueError:
                d = None
            if (
                isinstance(d, dict)
                and isinstance(d.get("sources"), list)
                and all(isinstance(p, str) for p in d["sources"])
                and json.dumps(
                    {**d, "sources": [t.path for t in self.sources]},
                    sort_keys=True,
                )
                == self._definition_json()
            ):
                self.sources = [TxLogTable(p) for p in d["sources"]]
                return self.refresh(spark)
        return super().recover(spark)
