"""Regenerate the committed plan baselines from current query plans.

Writes BOTH baselines: plans_baseline.json (bench headliners at sf0.1 —
checked by bench.py and tests/test_plan_fingerprint.py) and
plans_baseline_gate.json (the 50-query driver-gate window at sf0.01 —
checked by tests/test_plan_fingerprint.py in one batch pass).

Run after a DELIBERATE plan change (new optimization, new headliner) and
commit the resulting diff; the baselines' git history then documents every
plan evolution. Usage:

    python scripts/update_plan_baseline.py [headline_sf_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from bigdataingestion_spark import catalog
    from bigdataingestion_spark.caching import release_caches
    from bigdataingestion_spark.plans import fingerprint as fp
    from bigdataingestion_spark.session import get_spark

    spark = get_spark(app_name="plan-baseline", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    plans = {}
    for name, fn in catalog.headline_queries().items():
        # release tracked caches between builds: a cached relation from one
        # query rewrites identical subplans in the next to InMemoryTableScan,
        # making fingerprints depend on build ORDER instead of code
        release_caches()
        plans[name] = fp.fingerprint(fn(spark, sf_dir))
        print(f"{plans[name]}  {name}")
    release_caches()

    fp.BASELINE_PATH.write_text(
        json.dumps({"sf_dir": sf_dir, "plans": plans}, indent=1, sort_keys=True)
        + "\n"
    )
    print(f"wrote {fp.BASELINE_PATH} ({len(plans)} plans, sf_dir={sf_dir})")

    gate_sf = "/root/testdata/sf0.01"
    gate_plans = {}
    for name in list(catalog.queries_in_gate_order())[:50]:
        release_caches()
        gate_plans[name] = fp.fingerprint(catalog.CATALOG[name].fn(spark, gate_sf))
    release_caches()
    fp.GATE_BASELINE_PATH.write_text(
        json.dumps({"sf_dir": gate_sf, "plans": gate_plans}, indent=1, sort_keys=True)
        + "\n"
    )
    print(f"wrote {fp.GATE_BASELINE_PATH} ({len(gate_plans)} plans, sf_dir={gate_sf})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
