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


GATE_BASE = fp.load_baseline(fp.GATE_BASELINE_PATH)


# skip ONLY when a baseline exists but its fixture dir is gone on this
# machine; a MISSING baseline file must fail (assert below), not skip —
# otherwise deleting the file silently disarms the tripwire
@pytest.mark.skipif(
    bool(GATE_BASE) and not os.path.isdir(GATE_BASE.get("sf_dir", "")),
    reason="gate sf_dir absent",
)
def test_gate_window_plans_match_baseline(spark):
    """All 50 driver-gate-window queries in ONE pass (a parametrized
    version would pay 50 fixture hits): report every mismatch at once."""
    from bigdataingestion_spark.caching import release_caches

    assert GATE_BASE, "plans_baseline_gate.json missing"
    sf = GATE_BASE["sf_dir"]
    window = catalog.queries_in_gate_order()[:50]
    missing = [n for n in window if n not in GATE_BASE["plans"]]
    assert not missing, f"gate queries without baseline: {missing}"
    changed = {}
    for name in window:
        release_caches()
        got = fp.fingerprint(catalog.CATALOG[name].fn(spark, sf))
        if got != GATE_BASE["plans"][name]:
            changed[name] = (GATE_BASE["plans"][name], got)
    release_caches()
    assert not changed, (
        f"gate-window plans changed: {changed}. "
        "Deliberate? scripts/update_plan_baseline.py && commit."
    )
