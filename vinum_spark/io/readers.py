"""Eager/streaming readers (reference: ``vinum/io/arrow.py``).

All readers return a :class:`Table` over a lazy Spark scan — column
pruning, predicate pushdown, and partition pruning are applied by
Catalyst from whatever SQL runs on top. Compressed inputs (.gz/.bz2)
are handled natively by Spark's text-based sources.

Scale notes: a scan is split into ``spark.sql.files.maxPartitionBytes``
tasks; on 100 TB that's the whole parallelization story — no code here
needs to change.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple, Union

from pyspark.sql import SparkSession

from vinum_spark.api.stream_reader import StreamReader
from vinum_spark.api.table import Table
from vinum_spark.session import get_spark


def read_csv(
    path: str,
    header: bool = True,
    infer_schema: bool = True,
    delimiter: str = ",",
    spark: Optional[SparkSession] = None,
    **options,
) -> Table:
    """CSV → Table (reference: ``vinum/io/arrow.py:64-108``).

    ``inferSchema`` triggers an extra pass — acceptable for ad-hoc use;
    pass an explicit ``schema=`` option at scale.
    """
    spark = spark or get_spark()
    reader = (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", str(infer_schema).lower())
        .option("sep", delimiter)
    )
    schema = options.pop("schema", None)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return Table(reader.csv(path))


def stream_csv(path: str, spark: Optional[SparkSession] = None, **options) -> StreamReader:
    """Streaming CSV (reference: ``vinum/io/arrow.py:9-61``). On Spark the
    eager and streaming readers are the same partitioned scan; this exists
    for API parity and returns a :class:`StreamReader`."""
    tbl = read_csv(path, spark=spark, **options)
    return StreamReader(tbl.df)


def read_json(path: str, spark: Optional[SparkSession] = None, **options) -> Table:
    """Line-delimited JSON → Table (reference: ``vinum/io/arrow.py:111-148``)."""
    spark = spark or get_spark()
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return Table(reader.json(path))


def read_parquet(
    path: Union[str, Sequence[str]],
    columns: Optional[List[str]] = None,
    filters: Optional[Iterable[Tuple]] = None,
    spark: Optional[SparkSession] = None,
    **options,
) -> Table:
    """Parquet → Table (reference: ``vinum/io/arrow.py:151-248``).

    ``columns``/``filters`` mirror the reference's pyarrow passthrough
    args; on Spark they lower to projection + filter expressions, which
    Catalyst pushes into the scan (verify with ``PushedFilters`` in
    ``df.explain``). Hive-style partition discovery is automatic.
    """
    spark = spark or get_spark()
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    paths = [path] if isinstance(path, str) else list(path)
    df = reader.parquet(*paths)
    if columns:
        df = df.select(*columns)
    if filters:
        for col, op, val in filters:
            df = df.filter(_filter_expr(col, op, val))
    return Table(df)


def _filter_expr(col: str, op: str, val):
    from pyspark.sql import functions as F

    c = F.col(col)
    ops = {
        "=": c.__eq__,
        "==": c.__eq__,
        "!=": c.__ne__,
        "<": c.__lt__,
        "<=": c.__le__,
        ">": c.__gt__,
        ">=": c.__ge__,
    }
    if op in ops:
        return ops[op](val)
    if op == "in":
        return c.isin(list(val))
    if op == "not in":
        return ~c.isin(list(val))
    raise ValueError(f"unsupported filter op: {op}")
