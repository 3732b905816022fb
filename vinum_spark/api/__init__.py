from vinum_spark.api.table import Table
from vinum_spark.api.stream_reader import StreamReader

__all__ = ["Table", "StreamReader"]
