"""Dump ``explain('formatted')`` for named catalog queries to files.

Usage:
    python scripts/dump_plans.py OUTDIR SUFFIX SF_DIR query [query ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` for each query. To capture
"before" plans from an older checkout, set ``BDI_REPO`` to that checkout
(it is inserted at ``sys.path[0]``, ahead of everything — a bare
``PYTHONPATH`` would be shadowed by this repo's own root):

    git archive HEAD | tar -x -C /tmp/repo_head
    BDI_REPO=/tmp/repo_head python scripts/dump_plans.py out before <sf> q...
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, os.environ.get("BDI_REPO", str(Path(__file__).resolve().parent.parent)))


def main() -> int:
    outdir, suffix, sf_dir, *names = sys.argv[1:]
    from bigdataingestion_spark import catalog
    from bigdataingestion_spark.caching import release_caches
    from bigdataingestion_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    Path(outdir).mkdir(parents=True, exist_ok=True)
    import io
    from contextlib import redirect_stdout

    for name in names:
        release_caches()
        df = catalog.CATALOG[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        p = Path(outdir) / f"{name}_{suffix}.txt"
        p.write_text(plan)
        print(f"wrote {p} ({len(plan)} bytes)")
    release_caches()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
