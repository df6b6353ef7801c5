"""[EXT] Temporal joins Spark lacks as primitives: as-of join and bounded
range join, plus multi-resolution (hypertable-style) rollups.

All three are *compositions of built-in operators* chosen for their shuffle
shape at 100 TB — no nested-loop joins anywhere:

  * **As-of join** (each left row matched to the latest right row at or
    before its timestamp, per key): union the two tagged streams, one
    shuffle+sort by (key, ts), carry the right columns forward with
    ``last_value(..., ignoreNulls)``. Cost = one sort-shuffle of |L|+|R| —
    the canonical distributed as-of (vs. the O(|L|·|R|) nested loop a naive
    inequality join plans to).
  * **Bounded range join** (pairs within a time window, per key): join on
    (key, time_bucket) for the 2 buckets a window can span, then filter the
    exact predicate. Pair cost is per-bucket-quadratic, not global.
  * **Multi-resolution rollup**: GROUPING SETS computes hour + day + total
    aggregates in one pass over the input (one shuffle), the way a
    hypertable continuous aggregate maintains its levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the latest right row with
    ``right_ts <= left_ts`` and the same key (backward as-of, ties included).

    ``right`` must be unique per (key, right_ts) — pre-aggregate if not (the
    match would otherwise be ambiguous; engines disagree on the pick).
    Returns all left columns plus ``{col}{suffix}`` for each value column
    (NULL when no prior right row exists).
    """
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    tagged_r = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c != key
            else F.col(key)
            for c in lcols
        ],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = tagged_l.unionByName(tagged_r)
    # right rows sort before left rows at equal timestamps so a tie matches
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_is_left",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_is_left") == 1).drop("_is_left")


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Same semantics as :func:`asof_join`, implemented as a grouped-map
    ``applyInPandas`` running ``pd.merge_asof`` per key — the pandas-UDF
    alternative when per-group logic outgrows window expressions.

    Trade-off vs the window version: cogroup shuffles BOTH inputs by key and
    crosses into Python per group (Arrow-batched), but gives the full pandas
    toolbox inside. Prefer the window version for plain as-of; use this shape
    when the per-group computation is genuinely pandas-shaped.
    """
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    out_fields = list(left.schema.fields) + [
        StructField(f"{c}{suffix}", right.schema[c].dataType) for c in value_cols
    ]
    out_schema = StructType(out_fields)
    lcols = left.columns

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_sorted = l_pdf.sort_values(left_ts, kind="mergesort")
        if r_pdf.empty:
            out = l_sorted.copy()
            for c in value_cols:
                out[f"{c}{suffix}"] = None
            return out[[*lcols, *[f"{c}{suffix}" for c in value_cols]]]
        r_sorted = r_pdf.sort_values(right_ts, kind="mergesort")[
            [right_ts, *value_cols]
        ].rename(
            columns={right_ts: "_rts", **{c: f"{c}{suffix}" for c in value_cols}}
        )
        out = pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=left_ts,
            right_on="_rts",
            direction="backward",
        )
        return out[[*lcols, *[f"{c}{suffix}" for c in value_cols]]]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(
            lambda l, r: merge(l, r), schema=out_schema
        )
    )


def range_join_bucketed(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    window_seconds: int = 60,
) -> DataFrame:
    """All ordered pairs (a, b) with the same key and
    ``0 < b.ts - a.ts <= window``.

    Equi-join on (key, bucket) — each left row probes its own and the next
    bucket — then exact filter. The shuffle key carries the bucket, so pair
    blowup is bounded per (key, bucket) cell instead of per key.
    """
    # exact integer microseconds: casting timestamps to double loses
    # precision at epoch scale (1.7e9 s + 6 fractional digits = 16 sig digits)
    micros = F.unix_micros(F.col(ts_col))
    bucket = F.floor(micros / (window_seconds * 1_000_000))
    a = df.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("id_a"),
        micros.alias("us_a"),
        bucket.alias("_b"),
    )
    b = df.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("id_b"),
        micros.alias("us_b"),
        bucket.alias("_b0"),
    )
    probes = a.withColumn("_probe", F.explode(F.array(F.col("_b"), F.col("_b") + 1)))
    joined = probes.join(
        b, (probes._k == b._k) & (probes._probe == b._b0), "inner"
    )
    dt_us = F.col("us_b") - F.col("us_a")
    return (
        joined.filter((dt_us > 0) & (dt_us <= window_seconds * 1_000_000))
        .select(
            probes._k.alias(key),
            "id_a",
            "id_b",
            # exact integer microseconds — float seconds round differently
            # across engines at the 6th decimal
            dt_us.alias("delta_us"),
        )
    )


def multires_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Hour + day + grand-total aggregates in ONE pass via GROUPING SETS —
    the continuous-aggregate ladder of a time-series store. Output carries a
    ``grain`` discriminator ('hour' | 'day' | 'total')."""
    df = df.select(
        F.date_trunc("hour", F.col(ts_col)).alias("bucket_hour"),
        F.date_trunc("day", F.col(ts_col)).alias("bucket_day"),
        F.col(value_col).alias("_v"),
    )
    out = df.groupingSets(
        [["bucket_hour", "bucket_day"], ["bucket_day"], []],
        "bucket_hour",
        "bucket_day",
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("_v"), 4).alias("total"),
    )
    grain = (
        F.when(F.col("bucket_hour").isNotNull(), F.lit("hour"))
        .when(F.col("bucket_day").isNotNull(), F.lit("day"))
        .otherwise(F.lit("total"))
    )
    return out.select(
        grain.alias("grain"),
        F.coalesce(F.col("bucket_hour"), F.col("bucket_day")).alias("bucket"),
        "cnt",
        "total",
    )
