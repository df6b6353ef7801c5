from __future__ import annotations

import os

import pytest

# ---- fast/slow tier split (r14 verdict item 2) ---------------------------
# The DEFAULT run is the fast tier (pyproject addopts = -m "not slow"):
# every subsystem keeps its core suite fast (test_txlog, test_matview,
# test_operators, test_streaming, test_vocab, test_selection, the newest
# round's contract tests, the plan-fingerprint tripwire, ...); the files
# below are the multiprocess, hypothesis/property, stress and DEEP
# per-feature tiers whose basics those core suites and the oracle gate
# already cover. Full tier (CI / round close):
#     python -m pytest tests/ -q -m "slow or not slow"
# Per-file wall times from the r15 full run (797 passed, 41m44s) chose the
# split: fast tier ≈ 10-12 min.
SLOW_FILES = {
    # multiprocess / crash-concurrency tiers
    "test_matview_pins_multiprocess.py",
    "test_txlog_datasource_multiprocess.py",
    "test_cdf_replicate_multiprocess.py",
    "test_txlog_multiprocess.py",
    "test_matview_union_multiprocess.py",
    "test_identity_multiprocess.py",
    # hypothesis / property tiers
    "test_matview_join_property.py",
    "test_merge_property.py",
    "test_txlog_property.py",
    "test_chunker_property.py",
    "test_round4_property.py",
    # matview deep tiers (test_matview.py stays fast)
    "test_matview_topk.py",
    "test_matview_join.py",
    "test_matview_union.py",
    "test_matview_pins.py",
    "test_matview_schema.py",
    "test_matview_lease.py",
    # txlog deep tiers (test_txlog.py stays fast)
    "test_txlog_bloom.py",
    "test_txlog_cdf.py",
    "test_txlog_datasource.py",
    "test_txlog_merge_conditional.py",
    "test_txlog_nested_mapping.py",
    "test_txlog_dv.py",
    "test_txlog_column_mapping.py",
    "test_txlog_identity.py",
    "test_txlog_replace_where.py",
    "test_txlog_generated.py",
    "test_txlog_clone.py",
    "test_txlog_logscale.py",
    "test_txlog_reconcile.py",
    "test_txlog_datasource_cdf_batch.py",
    "test_txlog_review6.py",
    "test_streaming_txlog_sinks.py",
    # prior rounds' review/advice regression pins (test_round14 stays fast)
    "test_round13.py",
    "test_round11_review.py",
    "test_round10_advice.py",
    "test_round10_review.py",
    "test_round10_verdict.py",
    "test_round9_review.py",
    "test_round8_advice.py",
    "test_round8_verdict.py",
    "test_round7_advice.py",
    "test_round7_verdict.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in SLOW_FILES:
            item.add_marker(pytest.mark.slow)


TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_CORRECT = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from bigdataingestion_spark.session import get_spark

    warehouse = tmp_path_factory.mktemp("warehouse")
    spark = get_spark(
        app_name="bdi-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(warehouse)},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_smoke_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct_dir() -> str:
    return SF_CORRECT
