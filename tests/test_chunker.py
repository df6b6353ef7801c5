"""Chunk-planner tree-fold tests (reference ING:310-340 semantics, with the
==limit hole closed: descend iff count > limit, else write)."""

from bigdataingestion_spark.plans.chunker import Chunk, plan_chunks


def _profile_from_days(days: dict[tuple, int]) -> list[tuple]:
    """days: {(y, q, m, d): count}"""
    return [(y, q, m, d, c) for (y, q, m, d), c in days.items()]


def test_small_year_written_whole():
    profile = _profile_from_days({(2023, 1, 1, 5): 10, (2023, 3, 8, 2): 20})
    assert plan_chunks(profile, limit=100) == [Chunk(2023)]


def test_descend_to_quarters_and_months_and_days():
    days = {}
    # 2024 Q1 Jan: 31 days x 50 = 1550 (> 1000 -> day level)
    for d in range(1, 32):
        days[(2024, 1, 1, d)] = 50
    # 2024 Q1 Feb: 200 (month-level write)
    days[(2024, 1, 2, 10)] = 200
    # 2024 Q3: 300 total (quarter-level write)
    days[(2024, 3, 7, 1)] = 300
    # 2025: tiny -> year-level
    days[(2025, 2, 4, 1)] = 5
    chunks = plan_chunks(_profile_from_days(days), limit=1000)
    day_chunks = [c for c in chunks if c.level == "day"]
    assert len(day_chunks) == 31
    assert all(c.year == 2024 and c.quarter == 1 and c.month == 1 for c in day_chunks)
    assert Chunk(2024, 1, 2) in chunks
    assert Chunk(2024, 3) in chunks
    assert Chunk(2025) in chunks
    # no overlap: the month-level Feb chunk must not also appear at day level
    assert Chunk(2024, 1, 2, 10) not in chunks


def test_exactly_limit_writes_instead_of_dropping():
    """The reference drops ==limit quarter/month chunks (ING:233-237); we
    write them (documented deviation, SURVEY.md §4)."""
    days = {(2024, 1, 1, d): 100 for d in range(1, 11)}  # year total 1000 == limit
    chunks = plan_chunks(_profile_from_days(days), limit=1000)
    assert chunks == [Chunk(2024)]
    # month == limit under a >limit year
    days[(2024, 2, 4, 1)] = 500  # year total 1500 > limit; Q1 total 1000 == limit
    chunks = plan_chunks(_profile_from_days(days), limit=1000)
    assert Chunk(2024, 1) in chunks  # quarter written whole, not dropped
    assert Chunk(2024, 2) in chunks


def test_null_watermark_rows_form_one_chunk():
    profile = [(None, None, None, None, 7), (2024, 1, 1, 1, 5)]
    chunks = plan_chunks(profile, limit=100)
    assert Chunk(None) in chunks  # type: ignore[arg-type]
    assert Chunk(2024) in chunks


def test_coverage_is_exact_partition():
    """Every day-level input is covered by exactly one chunk."""
    import itertools

    days = {}
    for y, q in itertools.product((2023, 2024), (1, 2, 3, 4)):
        m0 = (q - 1) * 3 + 1
        for m in range(m0, m0 + 3):
            for d in (1, 15):
                days[(y, q, m, d)] = 77 if y == 2024 else 3
    chunks = plan_chunks(_profile_from_days(days), limit=200)

    def covers(c, key):
        y, q, m, d = key
        return (
            c.year == y
            and (c.quarter is None or c.quarter == q)
            and (c.month is None or c.month == m)
            and (c.day is None or c.day == d)
        )

    for key in days:
        assert sum(1 for c in chunks if covers(c, key)) == 1
