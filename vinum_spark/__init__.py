"""vinum_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dmitrykoval/vinum (reference surface:
``/root/reference/vinum/api/table.py``), re-expressed Spark-first.

Public API (mirrors the reference's ``vinum`` package):

- :class:`Table` — the queryable object (``Table.from_pydict / from_arrow /
  from_pandas``, ``.sql() / .sql_pd() / .explain() / .head() / .schema``).
- :func:`read_csv` / :func:`read_json` / :func:`read_parquet` /
  :func:`stream_csv` — eager/streaming readers (reference:
  ``vinum/io/arrow.py``). On Spark every scan is streamed & partitioned, so
  ``stream_csv`` and ``read_csv`` share one implementation.
- :func:`register_python` / :func:`register_numpy` — UDF registration
  (reference: ``vinum/core/udf.py:67,138``); ``np.*`` functions resolve
  automatically inside SQL.

Beyond the reference surface, ``vinum_spark.operators`` adds the
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal columns) and ``vinum_spark.streaming`` adds
event-time windowed aggregation over Structured Streaming.
"""

from vinum_spark.session import get_spark, stop_spark
from vinum_spark.api.table import Table
from vinum_spark.api.stream_reader import StreamReader
from vinum_spark.api.multi import sql
from vinum_spark.io.readers import read_csv, read_json, read_orc, read_parquet, stream_csv
from vinum_spark.functions.udf import (
    register_python,
    register_numpy,
    register_numpy_agg,
)

__all__ = [
    "Table",
    "sql",
    "StreamReader",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "stream_csv",
    "register_python",
    "register_numpy",
    "register_numpy_agg",
    "get_spark",
    "stop_spark",
]

__version__ = "0.1.0"
