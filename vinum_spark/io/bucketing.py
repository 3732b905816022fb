"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the dominant join (orders ↔ lineitem on orderkey) shuffles
both sides on every query unless the tables are bucketed on the join key
at write time. These helpers wrap ``bucketBy`` writes and verify the
shuffle actually disappears.

Usage (one-time layout cost, every subsequent join is exchange-free on
the bucketed key):

    write_bucketed(orders_df,  "orders_b",  "o_orderkey", buckets=64)
    write_bucketed(lineitem_df, "lineitem_b", "l_orderkey", buckets=64)
    joined = spark.table("orders_b").join(
        spark.table("lineitem_b"),
        F.col("o_orderkey") == F.col("l_orderkey"))
    # plan shows SortMergeJoin with NO Exchange on either side
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Union[str, Sequence[str]],
    buckets: int = 64,
    sort_cols: Union[str, Sequence[str], None] = None,
    path: Optional[str] = None,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) table.

    ``buckets`` should scale with data volume: target ~128-512 MB per
    bucket file so tasks stay balanced; both join sides must use the SAME
    bucket count and key for the exchange to be elided.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.format(fmt).mode("overwrite").bucketBy(buckets, *cols)
    if sort_cols:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*s)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the join plan contains no Exchange (bucketing worked)."""
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "simple"
    )
    return "Exchange" not in plan
