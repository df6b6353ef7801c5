"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it with
``oracle_sql()`` via DuckDB: row count, sorted column names, and an
order-insensitive value hash (rows stringified under sorted column order,
sorted, md5'd). Run before claiming any query done:

    python scripts/check_oracle.py [query ...]
    python scripts/check_oracle.py --gate   # first-50 window, as the driver gates
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    gate_only = "--gate" in args  # mirror the driver: first 50 entries only
    only = {a for a in args if not a.startswith("--")}

    import __spark_entry__ as entrymod
    from bigdataingestion_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    if gate_only:
        qs = dict(list(qs.items())[:50])
    oracles = entrymod.oracle_sql()
    failures = []
    from bigdataingestion_spark.caching import release_caches

    for name, fn in qs.items():
        if only and name not in only:
            continue
        release_caches()  # free tracked operator caches between queries
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        dt = time.time() - t0
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            h_s = value_hash(scols, srows)
            h_o = value_hash(ocols, orows)
            if h_s != h_o:
                problems.append("value-hash mismatch")
                # show first differing canonical line for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
                lo = sorted("|".join(canon(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"  spark : {a[:200]}")
                        problems.append(f"  duckdb: {b[:200]}")
                        break
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("      " + p)
            failures.append(name)
        else:
            print(f"OK    {name} ({dt:.1f}s, {len(srows)} rows)")

    spark.stop()
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all declared queries match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
