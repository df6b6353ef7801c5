"""Watermark-column heuristic parity (reference ING:162-168)."""

from bigdataingestion_spark.plans.watermark import heuristic_watermark_columns


def test_timestamp_prefixes_match():
    dtypes = [
        ("CreatedDate", "timestamp"),
        ("ModifiedTS", "timestamp"),
        ("updated_at", "timestamp"),
        ("LastModifiedDate", "timestamp"),
        ("LogTime", "timestamp"),
        ("RegistrationDate", "timestamp"),
    ]
    assert heuristic_watermark_columns(dtypes) == [d[0] for d in dtypes]


def test_non_matching_names_and_types_skipped():
    dtypes = [
        ("id", "bigint"),
        ("created", "string"),  # right name, wrong type
        ("ts", "timestamp"),  # wrong name
        ("MergeDate", "date"),  # date prefix merge*
        ("UnmergeDate", "date"),
        ("mergedate", "timestamp"),  # merge* only applies to date type
        ("birthdate", "date"),
    ]
    assert heuristic_watermark_columns(dtypes) == ["MergeDate", "UnmergeDate"]


def test_schema_order_preserved():
    dtypes = [("zz_none", "int"), ("updated", "timestamp"), ("created", "timestamp")]
    assert heuristic_watermark_columns(dtypes) == ["updated", "created"]
