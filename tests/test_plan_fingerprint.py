"""Plan-identity tripwire: headliner physical plans must match the
committed baseline (plans_baseline.json). A failure here means a code
change altered a headline query's physical plan — if deliberate,
regenerate with `python scripts/update_plan_baseline.py` and commit the
diff; if not, you just caught a plan regression before it cost a bench
round."""

from __future__ import annotations

import os

import pytest

from bigdataingestion_spark import catalog
from bigdataingestion_spark.plans import fingerprint as fp

BASE = fp.load_baseline()
SF_DIR = BASE.get("sf_dir", "/root/testdata/sf0.1")


def test_baseline_exists_and_covers_headliners():
    assert BASE, "plans_baseline.json missing — run scripts/update_plan_baseline.py"
    missing = set(catalog.headline_queries()) - set(BASE.get("plans", {}))
    assert not missing, f"headliners without a committed plan baseline: {missing}"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="baseline sf_dir absent")
@pytest.mark.parametrize("name", sorted(catalog.headline_queries()))
def test_headliner_plan_matches_baseline(spark, name):
    from bigdataingestion_spark.caching import release_caches

    want = BASE.get("plans", {}).get(name)
    if want is None:
        pytest.skip("no baseline entry (covered by the coverage test)")
    # cache-free plan: a tracked cache left by another query rewrites
    # identical subplans to InMemoryTableScan, making the fingerprint
    # order-dependent
    release_caches()
    got = fp.fingerprint(catalog.headline_queries()[name](spark, SF_DIR))
    release_caches()
    assert got == want, (
        f"{name}: physical plan changed (baseline {want}, now {got}). "
        "Deliberate? scripts/update_plan_baseline.py && commit."
    )
