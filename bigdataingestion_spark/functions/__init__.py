from bigdataingestion_spark.functions.io import load_table, ns_timestamp_columns

__all__ = ["load_table", "ns_timestamp_columns"]
