"""Regenerate plans_baseline.json from the current headline-query plans.

Run after a DELIBERATE plan change (new optimization, new headliner) and
commit the resulting diff; the baseline's git history then documents every
plan evolution. Usage:

    python scripts/update_plan_baseline.py [sf_dir]
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
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
