from vinum_spark.io.bucketing import compact_parquet, join_is_shuffle_free, write_bucketed
from vinum_spark.io.readers import read_csv, read_json, read_orc, read_parquet, stream_csv

__all__ = [
    "compact_parquet",
    "join_is_shuffle_free",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "stream_csv",
    "write_bucketed",
]
