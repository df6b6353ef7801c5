"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full catalog (see
``bigdataingestion_spark/catalog.py``) for the sf0.01 DuckDB correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bigdataingestion_spark import catalog  # noqa: E402

SMOKE_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable session confs the engine relies on (the driver
    may hand us a session our factory didn't build), and ship the package to
    Python workers (the driver's sys.path hack doesn't reach executors)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sc = spark.sparkContext
    if not getattr(sc, "_bdi_pyfile_added", False):
        import shutil
        import tempfile

        pkg_dir = Path(__file__).resolve().parent / "bigdataingestion_spark"
        zip_base = Path(tempfile.mkdtemp(prefix="bdi_pkg_")) / "bigdataingestion_spark"
        archive = shutil.make_archive(str(zip_base), "zip", pkg_dir.parent, "bigdataingestion_spark")
        sc.addPyFile(archive)
        sc._bdi_pyfile_added = True
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.q1_pricing_summary(_configure(spark), SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ [EXT])."""

    def wrap(fn):
        return lambda spark, sf_dir: fn(_configure(spark), sf_dir)

    return {name: wrap(fn) for name, fn in catalog.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted entries get the
    driver's weaker rows-only check)."""
    return catalog.oracle_sql()
