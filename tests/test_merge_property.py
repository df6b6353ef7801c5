"""Model-based test for conditional MERGE: random clause lists against a
driver-side Python reference implementing the documented semantics
(first matching clause per row category wins; unmatched rows carry;
source rows accepted by no insert clause are ignored). Every Spark-side
behavior — clause ordering, condition gating, SET */INSERT * mapping,
expression assignments — must agree with the model on every generated
(target, source, clauses) triple."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataingestion_spark.sinks.merge_clauses import (
    when_matched_delete,
    when_matched_update,
    when_not_matched_by_source_delete,
    when_not_matched_by_source_update,
    when_not_matched_insert,
)
from bigdataingestion_spark.sinks.txlog import TxLogTable

# condition grammar: (sql_string_or_None, python_predicate). Matched
# conditions see (tv, sv); insert conditions see sv (bare source names);
# by-source conditions see tv (bare target names).
MATCHED_CONDS = [
    (None, lambda tv, sv: True),
    ("s.v > t.v", lambda tv, sv: sv > tv),
    ("t.v % 2 = 0", lambda tv, sv: tv % 2 == 0),
    ("s.v = t.v", lambda tv, sv: sv == tv),
]
INSERT_CONDS = [
    (None, lambda sv: True),
    ("v > 3", lambda sv: sv > 3),
    ("v % 2 = 1", lambda sv: sv % 2 == 1),
]
BYSRC_CONDS = [
    (None, lambda tv: True),
    ("v < 3", lambda tv: tv < 3),
    ("v % 2 = 0", lambda tv: tv % 2 == 0),
]
# assignment grammar: (set_dict_or_None, python_fn(tv, sv) -> new_v)
MATCHED_SETS = [
    (None, lambda tv, sv: sv),  # SET *
    ({"v": "s.v + 10"}, lambda tv, sv: sv + 10),
    ({"v": "t.v + 100"}, lambda tv, sv: tv + 100),
]
INSERT_VALUES = [
    (None, lambda sv: sv),  # INSERT *
    ({"id": "s.id", "v": "s.v * 2"}, lambda sv: sv * 2),
]
BYSRC_SETS = [
    ({"v": "t.v + 1000"}, lambda tv: tv + 1000),
]


def _category(draw, kinds, conds):
    """A reachable clause list for one category: 0-2 clauses, every
    clause but the last carries a condition."""
    n = draw(st.integers(0, 2))
    out = []
    for i in range(n):
        kind = draw(st.sampled_from(kinds))
        pool = conds if i == n - 1 else [c for c in conds if c[0] is not None]
        cond = draw(st.sampled_from(pool))
        out.append((kind, cond))
    return out


@st.composite
def merge_case(draw):
    ids = list(range(6))
    target = {
        i: draw(st.integers(0, 9))
        for i in ids
        if draw(st.booleans())
    }
    source = {
        i: draw(st.integers(0, 9))
        for i in ids
        if draw(st.booleans())
    }
    matched = _category(draw, ["update", "delete"], MATCHED_CONDS)
    inserts = _category(draw, ["insert"], INSERT_CONDS)[:1]
    bysrc = _category(draw, ["update", "delete"], BYSRC_CONDS)
    spec = []
    for kind, cond in matched:
        if kind == "update":
            s = draw(st.sampled_from(MATCHED_SETS))
            spec.append(("matched_update", cond, s))
        else:
            spec.append(("matched_delete", cond, None))
    for _, cond in inserts:
        s = draw(st.sampled_from(INSERT_VALUES))
        spec.append(("insert", cond, s))
    for kind, cond in bysrc:
        if kind == "update":
            s = draw(st.sampled_from(BYSRC_SETS))
            spec.append(("bysrc_update", cond, s))
        else:
            spec.append(("bysrc_delete", cond, None))
    if not spec:
        spec.append(("matched_update", MATCHED_CONDS[0], MATCHED_SETS[0]))
    return target, source, spec


def _build_clauses(spec):
    out = []
    for kind, (cond, _), assign in spec:
        if kind == "matched_update":
            out.append(when_matched_update(set=assign[0], condition=cond))
        elif kind == "matched_delete":
            out.append(when_matched_delete(condition=cond))
        elif kind == "insert":
            out.append(
                when_not_matched_insert(values=assign[0], condition=cond)
            )
        elif kind == "bysrc_update":
            out.append(
                when_not_matched_by_source_update(
                    set=assign[0], condition=cond
                )
            )
        else:
            out.append(when_not_matched_by_source_delete(condition=cond))
    return out


def _reference(target, source, spec):
    matched = [s for s in spec if s[0].startswith("matched")]
    inserts = [s for s in spec if s[0] == "insert"]
    bysrc = [s for s in spec if s[0].startswith("bysrc")]
    out = {}
    for k, tv in target.items():
        if k in source:
            sv = source[k]
            fired = False
            for kind, (_, pred), assign in matched:
                if pred(tv, sv):
                    fired = True
                    if kind == "matched_update":
                        out[k] = assign[1](tv, sv)
                    break  # delete: drop
            if not fired:
                out[k] = tv  # carry
        else:
            fired = False
            for kind, (_, pred), assign in bysrc:
                if pred(tv):
                    fired = True
                    if kind == "bysrc_update":
                        out[k] = assign[1](tv)
                    break
            if not fired:
                out[k] = tv
    for k, sv in source.items():
        if k in target:
            continue
        for kind, (_, pred), assign in inserts:
            if pred(sv):
                out[k] = assign[1](sv)
                break
    return out


@given(merge_case())
@settings(max_examples=15, deadline=None)
def test_merge_agrees_with_reference_model(spark, tmp_path_factory, case):
    target, source, spec = case
    tmp = tmp_path_factory.mktemp("mergeprop")
    t = TxLogTable(str(tmp / "t"))
    t.append(
        spark.createDataFrame(
            [(k, v) for k, v in target.items()] or [],
            "id int, v int",
        )
    )
    src = spark.createDataFrame(
        [(k, v) for k, v in source.items()] or [], "id int, v int"
    )
    t.merge(spark, src, ["id"], _build_clauses(spec))
    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert got == _reference(target, source, spec), spec
