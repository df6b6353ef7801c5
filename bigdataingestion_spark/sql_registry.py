"""Read-side SQL registration for txlog tables and materialized views.

The lake's transactional tables (sinks/txlog.py) and incremental views
(sinks/matview.py) are Python-API objects; pyspark's Python Data Source
API has no catalog hook that would let ``spark.sql`` resolve them by
name for DML (documented deviation #9 in COVERAGE.md). The READ half
needs no such hook: :func:`register_tables` publishes each object's
current SNAPSHOT as a temp view, so analysts can ``spark.sql("SELECT …
FROM sales JOIN sales_by_region …")`` over transactionally-consistent
data by name.

Semantics — deliberately snapshot-scoped, like Delta's
``DataFrame``-from-a-version reads:

- each call RE-RESOLVES every table's latest snapshot; the registered
  view is then FROZEN at it. Commits that land after registration are
  invisible until the next ``register_tables`` call — queries joining
  several registered names therefore see one consistent point-in-time
  per name, never a torn mid-commit state.
- registration is metadata-only (one driver-side log replay per
  table); no data is read or cached. The temp view holds the
  snapshot's file list, so Spark's scan planning (column pruning,
  predicate pushdown into parquet, file-level stats skipping through
  the snapshot reader) applies unchanged.
- names are session-scoped temp views: they shadow nothing in a real
  metastore and vanish with the session.
- a registered name survives only until the underlying table's next
  ``vacuum()`` past the frozen snapshot (or past the matview's backing
  txlog snapshot): the temp view holds the snapshot's FILE LIST, and a
  vacuum that reclaims those files fails the analyst's query at scan
  time, not at registration. Re-register after vacuuming — or, for
  long-lived names over a table with concurrent maintenance, record a
  ``matview.pin.*`` retention floor on the table (the same mechanism
  join views use; ``vacuum()`` honors it) so the frozen snapshot's
  files outlive the registration.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# one source of truth for "plain SQL identifier" (shared with the
# matviews' group/aggregate/payload name validation)
from .sinks.matview import _NAME_RE


def register_tables(
    spark: SparkSession,
    tables: dict,
    at: dict | None = None,
    refresh: bool = False,
) -> dict[str, object]:
    """Publish each object's current snapshot as a temp view under its
    key. Values may be :class:`~bigdataingestion_spark.sinks.txlog.
    TxLogTable` instances, any matview kind (aggregate / join / top-k /
    union), or any object exposing ``read(spark) -> DataFrame`` — the
    matview ``read`` surfaces the user-facing columns (e.g. the top-k
    view's ``rank``), exactly what a SQL reader should see.

    Returns ``{name: version}`` — the snapshot version each view was
    frozen at (``None`` for objects that don't expose one) so callers
    can record the read's provenance: txlog tables are read AT the
    resolved version so the number is exact under concurrent writers;
    a matview refreshed concurrently is re-read (bounded retries) until
    frame and version agree, with ``None`` reported if it won't settle —
    the published frame is still internally CONSISTENT (one snapshot of
    the view's txlog), its version just cannot be attributed to either
    side of the racing refresh. Call again to move every name to the
    tables' current snapshots.

    ``refresh=True`` brings every matview up to date BEFORE publishing:
    each value exposing ``recover(spark)`` (all four matview kinds) is
    recovered first — the full remediation ladder, so a stale cursor, a
    moved dimension, or an unreadable window all heal rather than
    publishing stale state (data-shaped errors, e.g. a NULL group key,
    still propagate: they need an upstream fix, not a rebuild). Plain
    txlog tables are unaffected — registration already resolves their
    latest snapshot. Recovery runs during the validate-before-publish
    phase: a view that cannot recover raises with the session
    untouched.

    ``at`` (optional) maps a subset of the names to explicit versions —
    TIME TRAVEL for SQL readers: ``register_tables(spark, {"sales": t},
    at={"sales": 4})`` publishes the v4 snapshot, so ``spark.sql`` can
    compare a table against its own history by registering two names
    over one table. Only txlog tables are travelable (a matview is
    already a derived snapshot; rebuild/refresh it instead).

    The whole dict is validated AND resolved before any name is
    published — a bad entry (wrong type, garbage or out-of-range
    ``at`` version, empty table, unbuilt matview) raises with the
    session untouched, never partially re-registered.
    """
    at = dict(at) if at else {}
    for name, t in tables.items():
        if not _NAME_RE.match(name):
            raise ValueError(
                f"view name {name!r} is not a plain SQL identifier"
            )
        if getattr(t, "read", None) is None:
            raise TypeError(
                f"{name!r}: expected a TxLogTable or matview (an object "
                f"with read(spark)), got {type(t).__name__}"
            )
        if name in at:
            if not (hasattr(t, "version") and hasattr(t, "snapshot")):
                raise TypeError(
                    f"{name!r}: at= time travel needs a TxLogTable; "
                    f"{type(t).__name__} reads are always "
                    "current-snapshot"
                )
            at[name] = int(at[name])  # raises on garbage BEFORE publish
    stray = sorted(set(at) - set(tables))
    if stray:
        raise ValueError(f"at= names not being registered: {stray}")
    if refresh:
        # before resolution, so the frames below see the healed state;
        # still before ANY publish — a failing recovery leaves the
        # session untouched like every other validation error
        for t in tables.values():
            if callable(getattr(t, "recover", None)):
                t.recover(spark)
    # resolve EVERY frame before publishing ANY name: a bad at=
    # version, an empty table, or an unbuilt matview raises here with
    # the session untouched — publication below cannot fail partway
    resolved: list[tuple[str, object, object]] = []
    for name, t in tables.items():
        if hasattr(t, "version") and hasattr(t, "snapshot"):
            # TxLogTable: resolve the version FIRST and read AT it, so
            # the returned provenance is exact even when a concurrent
            # writer commits between the two
            v = at[name] if name in at else t.version()
            resolved.append((name, t.read(spark, version=v), v))
        elif hasattr(t, "view") and hasattr(t.view, "version"):
            # matview: read() resolves its own snapshot internally, so
            # bracket it with version reads and retry on movement — a
            # concurrently-refreshing view settles almost immediately
            ver = None
            df = None
            for _ in range(5):
                v = t.view.version()
                df = t.read(spark)
                if t.view.version() == v:
                    ver = v
                    break
            resolved.append((name, df, ver))
        else:
            resolved.append((name, t.read(spark), None))
    versions: dict[str, object] = {}
    for name, df, v in resolved:
        df.createOrReplaceTempView(name)
        versions[name] = v
    return versions


def unregister_tables(spark: SparkSession, names) -> None:
    """Drop the given temp views; missing names are ignored (the
    session may have been restarted since registration)."""
    for name in names:
        spark.catalog.dropTempView(name)
