"""As-of join, bounded range join, multi-resolution rollup."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bigdataingestion_spark.operators import temporal


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_backward_with_ties(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", ts("2024-01-01 10:00:00")),
            (2, "u1", ts("2024-01-01 10:05:00")),
            (3, "u1", ts("2024-01-01 09:00:00")),  # before any right row
            (4, "u2", ts("2024-01-01 10:00:00")),  # tie with right row
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01 09:30:00"), 100),
            ("u1", ts("2024-01-01 10:02:00"), 200),
            ("u2", ts("2024-01-01 10:00:00"), 300),
        ],
        ["user_id", "ts", "pe_id"],
    )
    out = {
        r.event_id: r.pe_id_asof
        for r in temporal.asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts",
            value_cols=["pe_id"],
        ).collect()
    }
    assert out[1] == 100  # latest right <= 10:00 is 09:30
    assert out[2] == 200  # 10:02 < 10:05
    assert out[3] is None  # nothing before 09:00
    assert out[4] == 300  # tie (==) matches


def test_asof_join_grouped_matches_window_impl(spark, sf_smoke_dir):
    """The applyInPandas (pd.merge_asof) implementation must agree with the
    window implementation on real data."""
    from pyspark.sql import functions as F

    from bigdataingestion_spark.functions.io import load_table

    ev = load_table(spark, sf_smoke_dir, "events").select("event_id", "user_id", "ts")
    purchases = (
        load_table(spark, sf_smoke_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("pe_id"))
    )
    a = temporal.asof_join(
        ev, purchases, key="user_id", left_ts="ts", right_ts="ts", value_cols=["pe_id"]
    )
    b = temporal.asof_join_grouped(
        ev, purchases, key="user_id", left_ts="ts", right_ts="ts", value_cols=["pe_id"]
    )
    ra = {(r.event_id, r.pe_id_asof) for r in a.collect()}
    rb = {(r.event_id, r.pe_id_asof) for r in b.collect()}
    assert ra == rb


def test_range_join_bucketed_exact_window(spark):
    rows = [
        (1, "u1", ts("2024-01-01 10:00:00")),
        (2, "u1", ts("2024-01-01 10:00:30")),  # +30s from 1
        (3, "u1", ts("2024-01-01 10:01:00")),  # +60s from 1 (boundary, incl)
        (4, "u1", ts("2024-01-01 10:02:30")),  # out of window from all
        (5, "u2", ts("2024-01-01 10:00:10")),  # other key
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    pairs = {
        (r.id_a, r.id_b): r.delta_us
        for r in temporal.range_join_bucketed(
            df, key="user_id", ts_col="ts", id_col="event_id", window_seconds=60
        ).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert pairs[(1, 3)] == 60_000_000  # inclusive boundary
    # no duplicate pairs despite the two-bucket probe
    assert len(pairs) == 3


def test_multires_rollup_ladder(spark):
    rows = [
        (ts("2024-01-01 10:10:00"), 1.0),
        (ts("2024-01-01 10:50:00"), 2.0),
        (ts("2024-01-01 11:10:00"), 4.0),
        (ts("2024-01-02 00:10:00"), 8.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = temporal.multires_rollup(df, "ts", "value").collect()
    by_grain = {}
    for r in out:
        by_grain.setdefault(r.grain, []).append(r)
    assert len(by_grain["hour"]) == 3
    assert len(by_grain["day"]) == 2
    assert len(by_grain["total"]) == 1
    assert by_grain["total"][0].total == 15.0
    day1 = [r for r in by_grain["day"] if r.bucket == ts("2024-01-01 00:00:00")][0]
    assert day1.cnt == 3 and day1.total == 7.0
