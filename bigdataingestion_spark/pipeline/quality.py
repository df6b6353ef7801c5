"""Data-quality expectations — the validation gate of an ingestion pipeline.

Declarative checks evaluated in ONE aggregation pass over the staged data
(every expectation becomes a conditional-count column — no per-check scans),
producing a report DataFrame-friendly structure and an optional hard fail.
The shape mirrors what managed pipelines (e.g. declarative ETL expectations)
provide: expect / expect-or-fail on row predicates, plus dataset-level
uniqueness and completeness checks.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: Column  # True = row passes
    fail_on_violation: bool = False
    max_violation_ratio: float = 0.0  # tolerated fraction of failing rows


@dataclass
class QualityReport:
    total_rows: int
    results: list[dict] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return all(r["passed"] for r in self.results if r["hard"])

    def violations(self) -> list[dict]:
        return [r for r in self.results if not r["passed"]]


class QualityError(RuntimeError):
    pass


def check(df: DataFrame, expectations: list[Expectation]) -> QualityReport:
    """Evaluate all expectations in one aggregate; raise QualityError if a
    hard expectation exceeds its tolerated violation ratio."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, e in enumerate(expectations):
        aggs.append(
            F.count(F.when(~e.predicate, 1)).alias(f"_viol_{i}")
        )
    row = df.agg(*aggs).first()
    total = row["_total"]
    report = QualityReport(total_rows=total)
    for i, e in enumerate(expectations):
        viol = row[f"_viol_{i}"]
        ratio = (viol / total) if total else 0.0
        report.results.append(
            {
                "name": e.name,
                "violations": viol,
                "ratio": round(ratio, 6),
                "passed": ratio <= e.max_violation_ratio,
                "hard": e.fail_on_violation,
            }
        )
    if not report.ok:
        bad = [r["name"] for r in report.violations() if r["hard"]]
        raise QualityError(f"hard expectations failed: {bad}")
    return report


def expect_unique(df: DataFrame, cols: list[str]) -> dict:
    """Dataset-level uniqueness check (needs its own aggregate — a shuffle
    keyed on the candidate key, run only when declared)."""
    total = df.count()
    distinct = df.select(cols).distinct().count()
    return {
        "name": f"unique({','.join(cols)})",
        "violations": total - distinct,
        "passed": total == distinct,
    }


def report_df(
    df: DataFrame,
    expectations: list[Expectation],
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Lazy, DataFrame-shaped version of :func:`check`: one row per rule
    (``rule``, ``violations``, ``violation_ratio``), nothing collected.

    All row-predicate rules still share ONE aggregation pass (conditional
    counts unpivoted via ``stack``); a declared uniqueness rule adds its own
    count-distinct aggregate — the only rule class that genuinely needs a
    shuffle keyed on the candidate key.
    """
    out = None
    if expectations:
        aggs = [F.count(F.lit(1)).alias("_total")]
        for i, e in enumerate(expectations):
            aggs.append(F.count(F.when(~e.predicate, 1)).alias(f"_v{i}"))
        agg = df.agg(*aggs)
        # unpivot via inline() over an array of literal structs — rule names
        # are passed as lit() parameters, never interpolated into SQL text
        # (a name containing a quote would break a stack() string)
        entries = F.array(
            *[
                F.struct(
                    F.lit(e.name).alias("rule"), F.col(f"_v{i}").alias("violations")
                )
                for i, e in enumerate(expectations)
            ]
        )
        out = agg.select(F.inline(entries), F.col("_total")).select(
            "rule",
            "violations",
            F.round(F.col("violations") / F.col("_total"), 6).alias("violation_ratio"),
        )
    if unique_cols:
        uniq = df.agg(
            F.count(F.lit(1)).alias("_t"),
            F.countDistinct(*[F.col(c) for c in unique_cols]).alias("_d"),
        ).select(
            F.lit(f"unique({','.join(unique_cols)})").alias("rule"),
            (F.col("_t") - F.col("_d")).alias("violations"),
            F.round((F.col("_t") - F.col("_d")) / F.col("_t"), 6).alias(
                "violation_ratio"
            ),
        )
        out = uniq if out is None else out.unionByName(uniq)
    if out is None:
        # no rules at all: empty report with the contract schema
        return df.sparkSession.createDataFrame(
            [], "rule string, violations bigint, violation_ratio double"
        )
    return out
