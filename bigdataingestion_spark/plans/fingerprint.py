"""Canonical physical-plan fingerprints — regression tripwire for bench.

Round 4 burned a full investigation deciding whether a +26% bench delta was
a plan regression or environment noise; the answer ("no headliner plan
changed") had to be re-derived by hand from explain output. This module
makes plan identity mechanically checkable: a fingerprint is the sha256 of
the NORMALIZED pre-execution physical plan (``explain`` "simple" mode — it
names every operator, exchange partitioning, pushed filter, and read
schema, i.e. exactly the properties the scale audit cares about), with the
run-varying noise stripped:

- expression ids  (``sum#123L`` -> ``sum``),
- plan / subquery ids (``[plan_id=42]``, ``Subquery subquery#1``),
- filesystem paths (fixture dirs, temp checkpoint dirs -> ``<path>``),
- InMemoryFileIndex entry counts and statistics sizes.

``bench.py`` compares each headliner's fingerprint against the committed
``plans_baseline.json`` before timing and reports ``plans_unchanged`` in
its JSON line; ``tests/test_plan_fingerprint.py`` fails the suite on any
unacknowledged plan change. After a DELIBERATE plan change, regenerate with
``python scripts/update_plan_baseline.py`` and commit the diff — the git
history of the baseline file then documents every plan evolution.

Fingerprints are sf-dependent (static size estimates steer the initial
join strategy), so the baseline records the sf-dir it was taken at and
comparisons are keyed per sf.
"""

from __future__ import annotations

import hashlib
import json
import re
from pathlib import Path

from pyspark.sql import DataFrame

_REPO = Path(__file__).resolve().parent.parent.parent
BASELINE_PATH = _REPO / "plans_baseline.json"  # bench headliners @ sf0.1
GATE_BASELINE_PATH = _REPO / "plans_baseline_gate.json"  # gate window @ sf0.01

_NORMALIZERS = [
    (re.compile(r"#\d+L?"), ""),  # expression ids: l_qty#123L
    (re.compile(r"\[plan_id=\d+\]"), "[plan_id]"),
    (re.compile(r"\[id=#?\d+\]"), "[id]"),
    (re.compile(r"subquery#?\d*", re.I), "subquery"),
    (re.compile(r"file:[^\s,\]\)]+"), "<path>"),
    (re.compile(r"/[A-Za-z0-9_./-]*(testdata|tmp|target|warehouse)[^\s,\]\)]*"), "<path>"),
    (re.compile(r"InMemoryFileIndex\([^)]*\)"), "InMemoryFileIndex(<n>)"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(<sz>)"),
    (re.compile(r"\d+\.\d+ (B|KiB|MiB|GiB)"), "<sz>"),
    (re.compile(r"cachedcount#?\d*"), "cachedcount"),
    # shuffle-partition COUNT is session config (tests run 8, bench 32),
    # not plan shape; the partitioning KIND (hash/range/single) is kept
    (re.compile(r"(hashpartitioning|rangepartitioning|RoundRobinPartitioning)\(([^)]*?),?\s*\d+\)"), r"\1(\2)"),
    # lambda variable names carry a session-global counter (x_17 vs x_1)
    (re.compile(r"\blambda ([a-z]+)_\d+\b"), r"lambda \1"),
    # DataFilters duplicates PushedFilters but truncates at 100 chars
    # INCLUDING expression ids, so the cut point shifts between sessions
    (re.compile(r"DataFilters: .*?, Format:"), "DataFilters: <df>, Format:"),
]


def plan_text(df: DataFrame, mode: str = "simple") -> str:
    """Pre-execution physical plan as a string (no job is run)."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def normalize(plan: str) -> str:
    for rx, sub in _NORMALIZERS:
        plan = rx.sub(sub, plan)
    # collapse whitespace runs so id-removal artifacts don't leak into the hash
    return re.sub(r"[ \t]+", " ", plan).strip()


def fingerprint(df: DataFrame) -> str:
    return hashlib.sha256(normalize(plan_text(df)).encode()).hexdigest()[:16]


def load_baseline(path: Path | None = None) -> dict:
    path = path or BASELINE_PATH
    if path.exists():
        return json.loads(path.read_text())
    return {}


def compare(current: dict[str, str], sf_dir: str) -> tuple[bool | None, list[str]]:
    """(plans_unchanged, changed_names) vs the committed baseline for this
    sf-dir. Tri-state: True = compared and identical, False = compared and
    diverged, None = NOT COMPARED (missing baseline, or a baseline taken
    at a different sf-dir) — so a consumer can tell "verified unchanged"
    from "no evidence either way". Bench still runs in the None case; the
    test layer decides whether absence is an error."""
    base = load_baseline()
    if base.get("sf_dir") != sf_dir:
        return None, []
    plans = base.get("plans", {})
    changed = [n for n, fp in current.items() if n in plans and plans[n] != fp]
    return not changed, changed
