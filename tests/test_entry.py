"""Driver-contract smoke tests for __spark_entry__.py.

The full sf0.01 oracle comparison lives in scripts/check_oracle.py (run it
before claiming queries done); here we verify the contract shape cheaply.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty"}


def test_every_oracle_has_a_query():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
    # the vast majority of queries must have the strong (oracle) check
    assert len(oracles) >= len(qs) - 3


def test_sample_queries_run_on_smoke_data(spark, sf_smoke_dir):
    qs = entry.queries()
    for name in ["ingest_chunk_profile", "text_quality_stats", "embedding_cosine_topk"]:
        df = qs[name](spark, sf_smoke_dir)
        assert df.count() > 0, name
