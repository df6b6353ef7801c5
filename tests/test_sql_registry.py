"""Read-side SQL registration (sql_registry.py) — the analyst-facing
half of COVERAGE.md deviation #9: txlog tables and matviews queryable
by name through ``spark.sql``, frozen at a consistent snapshot per
``register_tables`` call.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataingestion_spark.sinks.matview import IncrementalAggView, IncrementalTopKView
from bigdataingestion_spark.sinks.txlog import TxLogTable
from bigdataingestion_spark.sql_registry import register_tables, unregister_tables

SCHEMA = "id long, grp string, val double"


def _table(spark, tmp_path, name="t"):
    t = TxLogTable(str(tmp_path / name))
    t.append(
        spark.createDataFrame(
            [(i, f"g{i % 3}", float(i)) for i in range(1, 31)], SCHEMA
        )
    )
    return t


def test_register_and_query_by_name(spark, tmp_path):
    t = _table(spark, tmp_path)
    versions = register_tables(spark, {"sales": t})
    assert versions == {"sales": t.version()}
    got = spark.sql(
        "SELECT grp, count(*) AS n, sum(val) AS s FROM sales GROUP BY grp"
    ).collect()
    assert {r["grp"]: (r["n"], r["s"]) for r in got} == {
        r["grp"]: (r["n"], r["s"])
        for r in t.read(spark)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    unregister_tables(spark, ["sales"])
    assert not any(v.name == "sales" for v in spark.catalog.listTables())


def test_snapshot_isolation_across_concurrent_commit(spark, tmp_path):
    """A commit landing AFTER registration is invisible until
    re-registration — the registered name is a consistent snapshot,
    never a live pointer that could tear mid-query."""
    t = _table(spark, tmp_path)
    register_tables(spark, {"sales": t})
    n0 = spark.sql("SELECT count(*) AS n FROM sales").first()["n"]
    t.append(spark.createDataFrame([(100, "g0", 1.0)], SCHEMA))
    t.delete(spark, "id <= 5")
    assert spark.sql("SELECT count(*) AS n FROM sales").first()["n"] == n0
    register_tables(spark, {"sales": t})  # re-resolve: now current
    assert (
        spark.sql("SELECT count(*) AS n FROM sales").first()["n"]
        == t.read(spark).count()
    )


def test_matview_readable_by_name(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.alter_properties({"cdf.enabled": "true"})
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"],
        {"n": ("count", "1"), "s": ("sum", "val")},
    )
    mv.build(spark)
    topk = IncrementalTopKView(
        t, str(tmp_path / "topk"), ["grp"],
        order_by="val", k=2, payload=["id"],
    )
    topk.build(spark)
    versions = register_tables(
        spark, {"sales": t, "sales_by_grp": mv, "sales_top2": topk}
    )
    assert versions["sales_by_grp"] == mv.view.version()
    # the matview by name equals SQL over the base table by name — and
    # the top-k view surfaces its user-facing rank column through SQL
    joined = spark.sql(
        """
        SELECT v.grp, v.n, v.s
        FROM sales_by_grp v
        JOIN (SELECT grp, count(*) AS n, sum(val) AS s
              FROM sales GROUP BY grp) b
          ON v.grp = b.grp AND v.n = b.n AND abs(v.s - b.s) < 1e-9
        """
    )
    assert joined.count() == 3
    top = spark.sql(
        "SELECT grp, rank, id FROM sales_top2 WHERE rank = 1"
    ).collect()
    assert len(top) == 3


def test_bad_name_and_bad_object_refused(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="identifier"):
        register_tables(spark, {"bad name": t})
    with pytest.raises(TypeError, match="read"):
        register_tables(spark, {"x": object()})


def test_time_travel_registration(spark, tmp_path):
    """at= publishes a HISTORICAL snapshot under a name, so spark.sql
    can diff a table against its own past by registering two names
    over one table."""
    t = _table(spark, tmp_path)
    v0 = t.version()
    t.delete(spark, "id <= 10")
    register_tables(
        spark, {"sales_now": t, "sales_then": t}, at={"sales_then": v0}
    )
    gone = spark.sql(
        """
        SELECT count(*) AS n FROM sales_then
        WHERE id NOT IN (SELECT id FROM sales_now)
        """
    ).first()["n"]
    assert gone == 10
    with pytest.raises(TypeError, match="time travel"):
        from bigdataingestion_spark.sinks.matview import IncrementalAggView

        t.alter_properties({"cdf.enabled": "true"})
        mv = IncrementalAggView(
            t, str(tmp_path / "mv"), ["grp"], {"n": ("count", "1")}
        )
        mv.build(spark)
        register_tables(spark, {"v": mv}, at={"v": 0})
    with pytest.raises(ValueError, match="not being registered"):
        register_tables(spark, {"sales_now": t}, at={"other": 1})
