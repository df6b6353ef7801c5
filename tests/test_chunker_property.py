"""Property-based chunk-planner invariants (SURVEY §5.3): for ANY volume
distribution, the plan is an exact partition of the day-level profile and
every written chunk is either day-level or within the limit."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataingestion_spark.plans.chunker import plan_chunks

day_entry = st.tuples(
    st.integers(min_value=2020, max_value=2026),  # year
    st.integers(min_value=1, max_value=12),  # month
    st.integers(min_value=1, max_value=28),  # day
    st.integers(min_value=1, max_value=5000),  # count
)


def _profile(entries):
    # collapse duplicate (y, m, d) and derive quarter
    agg = {}
    for y, m, d, c in entries:
        agg[(y, m, d)] = agg.get((y, m, d), 0) + c
    return [((y), ((m - 1) // 3 + 1), m, d, c) for (y, m, d), c in agg.items()]


def _covers(chunk, key):
    y, q, m, d = key
    return (
        chunk.year == y
        and (chunk.quarter is None or chunk.quarter == q)
        and (chunk.month is None or chunk.month == m)
        and (chunk.day is None or chunk.day == d)
    )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(day_entry, min_size=1, max_size=60),
    st.integers(min_value=1, max_value=20000),
)
def test_plan_is_exact_partition_and_respects_limit(entries, limit):
    profile = _profile(entries)
    chunks = plan_chunks(profile, limit)
    counts = {(y, q, m, d): c for y, q, m, d, c in profile}

    # 1. every day-cell covered by exactly one chunk
    for key in counts:
        assert sum(1 for c in chunks if _covers(c, key)) == 1

    # 2. every non-day chunk's total is within the limit
    for c in chunks:
        if c.level != "day":
            total = sum(v for k, v in counts.items() if _covers(c, k))
            assert total <= limit

    # 3. total rows conserved
    assert sum(
        sum(v for k, v in counts.items() if _covers(c, k)) for c in chunks
    ) == sum(counts.values())
