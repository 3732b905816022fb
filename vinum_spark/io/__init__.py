from vinum_spark.io.readers import read_csv, read_json, read_parquet, stream_csv

__all__ = ["read_csv", "read_json", "read_parquet", "stream_csv"]
