"""Predicate-over-statistics file skipping for txlog DML.

``TxLogTable.delete``/``update`` take a SQL predicate string; before
their file-finding scan runs, this module decides — from the log-held
per-file min/max/null stats alone — which files POSSIBLY contain a
matching row. The contract is strictly conservative (Delta's
data-skipping contract): a file is excluded only when the supported
analysis PROVES no row can satisfy the predicate; any construct outside
the supported subset makes the whole predicate unskippable (every file
stays a candidate). Wrong answers are therefore impossible; the only
failure mode is a larger scan.

Supported subset (everything else bails):

    expr     := conj
    conj     := term (AND term)*
    term     := '(' conj ')'
              | col op literal
              | literal op col          (mirrored)
              | col BETWEEN lit AND lit
              | col IN '(' lit, ... ')'
              | col IS [NOT] NULL
    op       := = | == | != | <> | < | <= | > | >=

OR / NOT / arithmetic / function calls / column-column comparisons bail.
Literal/column type classes must agree: numeric literals skip on "num"
stats; string literals skip on "str" stats, and for DATE/TIMESTAMP
columns the literal must parse as an ISO date/timestamp (stats for those
columns are stored as order-faithful ISO-8601 strings). A mismatch bails
on that term rather than guessing at cast semantics.

NULL semantics carry through: value comparisons never match NULL rows,
so range-excluding a file is sound regardless of its null count;
``IS NULL`` excludes zero-null files; ``IS NOT NULL`` excludes all-null
files.
"""

from __future__ import annotations

import functools
import json
import re
from dataclasses import dataclass

from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampNTZType,
    TimestampType,
)

# Column-mapping metadata keys — the SINGLE source of truth (txlog.py
# aliases these): a key renamed in one module but not the other would
# silently disable the mapped-stats translation (conservative, so no
# test fails loudly) while other consumers keep working.
PHYS_NAME_KEY = "txlog.physicalName"
NESTED_PHYS_KEY = "txlog.nestedPhysical"

_NUM_TYPES = (
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    BooleanType,
)
_ISO_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?$")

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lpar>\()
      | (?P<rpar>\))
      | (?P<comma>,)
      | (?P<op><=|>=|==|!=|<>|=|<|>)
      | (?P<num>-?\d+(\.\d+)?([eE][+-]?\d+)?)
      | (?P<str>'(?:[^']|'')*')
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*|`[^`]+`)
    )""",
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str


def _tokenize(s: str) -> list[_Tok] | None:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None:
            return None if s[pos:].strip() else out
        pos = m.end()
        for kind in ("lpar", "rpar", "comma", "op", "num", "str", "word"):
            if m.group(kind) is not None:
                out.append(_Tok(kind, m.group(kind)))
                break
    return out


# term representation: ("cmp", col, op, (kind, value)) | ("between", col, lo, hi)
# | ("in", col, [(kind, value), ...]) | ("isnull", col) | ("notnull", col)


class _Bail(Exception):
    pass


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise _Bail
        self.i += 1
        return t

    def word_is(self, *names) -> bool:
        t = self.peek()
        return t is not None and t.kind == "word" and t.text.upper() in names

    def parse(self) -> list:
        terms = self.conj()
        if self.peek() is not None:
            raise _Bail  # trailing junk
        return terms

    def conj(self) -> list:
        terms = [self.term()]
        while self.word_is("AND"):
            self.take()
            terms.append(self.term())
        if self.word_is("OR"):
            raise _Bail
        return terms

    def term(self):
        t = self.peek()
        if t is None:
            raise _Bail
        if t.kind == "lpar":
            self.take()
            inner = self.conj()
            if self.take().kind != "rpar":
                raise _Bail
            return ("group", inner)
        if t.kind in ("num", "str"):  # mirrored: literal op col
            lit = self._literal()
            op = self.take()
            col = self._column()
            if op.kind != "op":
                raise _Bail
            return ("cmp", col, _mirror(op.text), lit)
        col = self._column()
        nxt = self.peek()
        if nxt is None:
            raise _Bail
        if nxt.kind == "op":
            self.take()
            return ("cmp", col, _norm_op(nxt.text), self._literal())
        if self.word_is("BETWEEN"):
            self.take()
            lo = self._literal()
            if not self.word_is("AND"):
                raise _Bail
            self.take()
            return ("between", col, lo, self._literal())
        if self.word_is("IN"):
            self.take()
            if self.take().kind != "lpar":
                raise _Bail
            lits = [self._literal()]
            while self.peek() is not None and self.peek().kind == "comma":
                self.take()
                lits.append(self._literal())
            if self.take().kind != "rpar":
                raise _Bail
            return ("in", col, lits)
        if self.word_is("IS"):
            self.take()
            neg = False
            if self.word_is("NOT"):
                self.take()
                neg = True
            if not self.word_is("NULL"):
                raise _Bail
            self.take()
            return ("notnull", col) if neg else ("isnull", col)
        raise _Bail

    def _column(self) -> str:
        t = self.take()
        if t.kind != "word" or t.text.upper() in (
            "AND", "OR", "NOT", "NULL", "TRUE", "FALSE", "IN", "IS", "BETWEEN",
        ):
            raise _Bail
        return t.text.strip("`")

    def _literal(self):
        t = self.take()
        if t.kind == "num":
            v = float(t.text) if any(c in t.text for c in ".eE") else int(t.text)
            return ("num", v)
        if t.kind == "str":
            return ("str", t.text[1:-1].replace("''", "'"))
        raise _Bail  # NULL/TRUE/FALSE literals, functions: bail


def _norm_op(op: str) -> str:
    return {"==": "=", "<>": "!="}.get(op, op)


def _mirror(op: str) -> str:
    m = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
    return m.get(_norm_op(op), _norm_op(op))


def _lit_for_column(lit, dtype):
    """Check literal/column compatibility; normalize to the stats' value
    space ((kind, value)) or raise _Bail. Memoized (Spark DataTypes are
    hashable): the result is file-independent, and _term_excludes runs
    per file — without the cache a timestamp DELETE over 100k files
    would re-parse the same literal 100k times."""
    return _lit_resolve(lit[0], lit[1], dtype)


@functools.lru_cache(maxsize=1024)
def _lit_resolve(kind, v, dtype):
    if isinstance(dtype, _NUM_TYPES):
        if kind != "num":
            raise _Bail
        return ("num", v)
    if isinstance(dtype, StringType):
        if kind != "str":
            raise _Bail
        return ("str", v)
    if isinstance(dtype, DateType):
        # a time-suffixed literal would compare lexicographically beyond
        # the date-only stats value while Spark CASTS it to a date — a
        # wrong skip. Pure dates only.
        if kind != "str" or not re.fullmatch(r"\d{4}-\d{2}-\d{2}", v):
            raise _Bail
        return ("str", v)
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        # stats hold full ``datetime.isoformat()`` strings. A SHORT form
        # ('2024-01-01', '... 12:30') compared raw would sort BEFORE the
        # equivalent full form ('2024-01-01T00:00:00') and wrongly skip a
        # file whose min is exactly that instant — Spark casts the short
        # literal to the full timestamp. Round-trip through
        # datetime.fromisoformat to canonicalize; unparseable bails.
        if kind != "str" or not _ISO_DATE.match(v):
            raise _Bail
        import datetime as _dt

        try:
            return ("str", _dt.datetime.fromisoformat(v.replace(" ", "T")).isoformat())
        except ValueError:
            raise _Bail from None
    raise _Bail  # decimal/binary/array/map: no judgeable stats for these


def _term_excludes(term, stats: dict, types: dict) -> bool:
    """True iff the file's stats PROVE no row satisfies this term (and
    therefore the AND-conjunction). Raises _Bail when the term can't be
    judged for this file."""
    tag = term[0]
    if tag == "group":
        return any(_conj_excludes(term[1], stats, types))
    col = term[1]
    fs = stats.get(col.lower())
    dtype = types.get(col.lower())
    if fs is None or dtype is None:
        raise _Bail
    nulls = fs.get("nulls") or 0
    all_null = fs.get("min") is None
    if tag == "isnull":
        return nulls == 0
    if tag == "notnull":
        return all_null
    if all_null:
        return True  # value comparisons never match NULL rows
    lo, hi, k = fs["min"], fs["max"], fs.get("k")

    def one(lit, op) -> bool:
        kind, v = _lit_for_column(lit, dtype)
        if kind != k:
            raise _Bail
        if op == "=":
            return v < lo or v > hi
        if op == "!=":
            return lo == hi == v and nulls == 0
        if op == "<":
            return lo >= v
        if op == "<=":
            return lo > v
        if op == ">":
            return hi <= v
        if op == ">=":
            return hi < v
        raise _Bail

    if tag == "cmp":
        return one(term[3], term[2])
    if tag == "between":
        return one(term[2], ">=") or one(term[3], "<=")
    if tag == "in":
        return all(one(lit, "=") for lit in term[2])
    raise _Bail


def _conj_excludes(terms, stats, types):
    for t in terms:
        try:
            yield _term_excludes(t, stats, types)
        except _Bail:
            yield False  # unjudgeable term can't exclude; others still may


def _nested_struct_entries(schema: StructType) -> list:
    """(logical dotted path, physical dotted path, leaf type) for every
    nested leaf reachable through PURE STRUCT nesting (arrays/maps stop
    the walk — their element stats cannot prune element-wise predicate
    semantics). Physical paths join the top-level field's frozen
    physical name with each nested field's frozen physical leaf name
    (``txlog.nestedPhysical``, identity when absent) — the same dotted
    keys the footer harvest records."""
    out = []
    for f in schema.fields:
        if not isinstance(f.dataType, StructType):
            continue
        ptop = (f.metadata or {}).get(PHYS_NAME_KEY, f.name)
        raw = (f.metadata or {}).get(NESTED_PHYS_KEY)
        nmap = dict(json.loads(raw)) if raw else {}

        def walk(dt, lrel, prel, _nmap=nmap, _f=f, _ptop=ptop):
            from pyspark.sql.types import ArrayType, MapType

            for c in dt.fields:
                lpath = f"{lrel}{c.name}"
                ppath = f"{prel}{_nmap.get(lpath, c.name)}"
                if isinstance(c.dataType, StructType):
                    walk(c.dataType, lpath + ".", ppath + ".")
                elif not isinstance(c.dataType, (ArrayType, MapType)):
                    # container-typed children are NOT leaves: no footer
                    # stats key matches them and no consumer may treat
                    # their container dtype as judgeable
                    out.append(
                        (
                            f"{_f.name}.{lpath}",
                            f"{_ptop}.{ppath}",
                            c.dataType,
                        )
                    )

        walk(f.dataType, "", "")
    return out


def candidate_files(
    predicate: str,
    schema_json: str,
    files,
    file_stats: dict,
    session_tz: str | None = None,
) -> list:
    """Subset of ``files`` that may contain rows matching ``predicate``.
    Returns ``list(files)`` untouched whenever the predicate is outside
    the supported subset — skipping is an optimization, never a filter
    on correctness.

    ``session_tz`` is ``spark.sql.session.timeZone`` of the session that
    will EVALUATE the predicate. File stats for TIMESTAMP (LTZ) columns
    are normalized to naive UTC, but Spark casts a predicate's string
    literal in the session timezone — under a non-UTC session the same
    literal names a different instant than the stats assume, and a skip
    could silently exclude matching files. LTZ-literal terms are
    therefore judged only when the session is known to be UTC (the
    default ``None`` = unknown = disabled). TIMESTAMP_NTZ and DATE
    stats are timezone-free and stay enabled regardless."""
    toks = _tokenize(predicate)
    if toks is None:
        return list(files)
    try:
        terms = _Parser(toks).parse()
    except _Bail:
        return list(files)
    utc = session_tz is not None and session_tz.upper() in (
        "UTC",
        "ETC/UTC",
        "GMT",
        "Z",
        "+00:00",
    )
    schema = StructType.fromJson(json.loads(schema_json))
    types = {
        f.name.lower(): f.dataType
        for f in schema.fields
        if utc or not isinstance(f.dataType, TimestampType)
    }
    # column mapping: footer stats are keyed by the PHYSICAL parquet
    # column names, while predicate terms use logical names — translate
    # through the schema's mapping metadata (identity on unmapped tables;
    # stats of dropped physical columns simply never match a term)
    p2l = {
        (f.metadata or {}).get(PHYS_NAME_KEY, f.name).lower():
            f.name.lower()
        for f in schema.fields
    }
    # nested struct leaves: predicate terms like ``address.zip = '9'``
    # judge against the leaf's dotted footer stats, translated through
    # BOTH mapping levels. A dotted logical path that collides with a
    # literal flat column name is ambiguous — drop BOTH interpretations
    # (no proof beats a wrong one). The collision check runs against the
    # UNFILTERED flat names: a flat TimestampType homonym is absent from
    # ``types`` under a non-UTC session, and missing it here would
    # consult the nested leaf's stats for a predicate Spark evaluates
    # against the flat column — a wrong skip.
    flat_names = {f.name.lower() for f in schema.fields}
    for lpath, ppath, dtype in _nested_struct_entries(schema):
        ll = lpath.lower()
        if ll in flat_names:
            types.pop(ll, None)
            p2l.pop(ppath.lower(), None)
            continue
        if utc or not isinstance(dtype, TimestampType):
            types[ll] = dtype
        p2l[ppath.lower()] = ll
    logical_names = set(p2l.values())
    out = []
    for f in files:
        st = file_stats.get(f)
        if st is not None:
            # non-dict entries are file-level annotations (e.g. the
            # "__bloom__" sidecar ref), not per-column stats. A key
            # absent from the mapping that COLLIDES with a current
            # logical name is a stale physical column shadowing a
            # dropped+re-added logical — consulting it would be unsound
            # (the old column's range says nothing about the new one),
            # so it is dropped; non-colliding unknowns pass through.
            st = {
                p2l.get(k.lower(), k.lower()): v
                for k, v in st.items()
                if isinstance(v, dict)
                and (
                    k.lower() in p2l
                    or k.lower() not in logical_names
                )
            }
        if st is None or not any(_conj_excludes(terms, st, types)):
            out.append(f)
    return out
