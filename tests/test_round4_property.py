"""Property-based cross-checks for the second round-4 operator batch.

Two formulations, one semantics: ``temporal.latest_state`` (struct-max
aggregate, the scale path) must equal the row_number-window formulation
(the oracle's shape) on ANY input. ``similarity.quantize_int8`` must honor
its reconstruction-error contract on ANY vector set. Hypothesis drives the
inputs; Spark jobs are tiny, so examples are capped for runtime.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataingestion_spark.operators import similarity, temporal

event = st.tuples(
    st.integers(min_value=1, max_value=5),       # user_id
    st.integers(min_value=0, max_value=10),      # ts offset (hours) — dups likely
    st.integers(min_value=1, max_value=50),      # event_id
    st.sampled_from(["a", "b", "c"]),            # event_type
    st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
)


@settings(max_examples=12, deadline=None)
@given(st.lists(event, min_size=1, max_size=25, unique_by=lambda e: e[2]))
def test_latest_state_equals_window_formulation(spark, rows):
    base = datetime(2024, 1, 1)
    data = [
        (u, base + timedelta(hours=h), eid, et, float(v))
        for (u, h, eid, et, v) in rows
    ]
    df = spark.createDataFrame(
        data, ["user_id", "ts", "event_id", "event_type", "value"]
    )
    got = {
        r.user_id: (r.last_ts, r.last_event_id, r.last_event_type, r.last_value)
        for r in temporal.latest_state(df).collect()
    }
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    want = {
        r.user_id: (r.ts, r.event_id, r.event_type, r.value)
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .collect()
    }
    assert got == want


vector = st.lists(
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(vector, min_size=1, max_size=6))
def test_quantize_int8_contract(spark, vecs):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )
    for row in similarity.quantize_int8(df).collect():
        src = [float(x) for x in vecs[row.vec_id]]
        lo, hi = min(src), max(src)
        assert all(0 <= c <= 255 for c in row.codes)
        if hi > lo:
            # max reconstruction error bounded by half a quantization step
            # (+ the 6dp output rounding)
            assert row.max_abs_err <= (hi - lo) / 510 + 1e-6
        else:
            assert row.codes == [0] * len(src)
            assert row.max_abs_err == 0.0
