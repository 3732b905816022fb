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

import os
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


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    partition_cols: Union[str, Sequence[str], None] = None,
) -> int:
    """Rewrite a parquet dataset into ~``target_file_bytes`` files — the
    small-file compaction every long-running ingestion pipeline needs:
    streaming sinks and incremental batches leave thousands of KB-sized
    files whose per-file open/footer cost dominates scans and whose
    count explodes driver file-listing memory at 100 TB.

    File count = ceil(current total bytes / target), from the scan's
    file-listing statistics (no data read, no extra job). The rewrite
    itself is one ``repartition`` — a round-robin shuffle that also
    rebalances skewed input files — or, with ``partition_cols``, a hash
    shuffle on those columns so each hive partition is written by the
    tasks that own it. Returns the chosen file count.

    The 256 MB default matches ``maxPartitionBytes``-sized scan splits:
    compacted files re-split cleanly on read. Run per partition (point
    ``src`` at one hive partition) to bound the shuffle to fresh data
    instead of rewriting the corpus.
    """
    if target_file_bytes < 1:
        raise ValueError(f"target_file_bytes must be >= 1, got {target_file_bytes}")
    # the src read is lazy and dst is written with mode('overwrite'):
    # dst == src would delete the source files before the read executes
    # and lose the dataset, so in-place compaction is refused — compact
    # into a sibling dir and swap
    if os.path.abspath(dst) == os.path.abspath(src):
        raise ValueError(
            f"compact_parquet: dst must differ from src ({src!r}); in-place "
            "compaction would drop the lazily-read source before the rewrite "
            "runs. Write to a sibling path and rename."
        )
    from pyspark.sql import functions as F

    df = spark.read.parquet(src)
    total = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    n_files = max(1, -(-total // target_file_bytes))
    if partition_cols:
        cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        # Hashing on the partition columns alone would write ONE file per
        # hive partition regardless of size (a 20 GB skewed partition ->
        # one 20 GB file from one task). Apportion the global file count
        # to partitions by row share (bytes/rows assumed uniform within a
        # dataset, half-up rounding) and salt the shuffle key so each
        # partition splits into ~its own file count. The per-partition
        # frame is JOINED back on the key, never inlined as literals: a
        # collected when-chain is fine at dozens of partitions but blows
        # up plan size and driver memory at thousands. The two .first()
        # calls below each fetch a single aggregate row (bounded).
        # persist the (tiny, partition-cardinality-bounded) counts
        # frame FIRST: total_rows and the __k aggregate below both
        # derive from it, and without the persist each would re-run
        # the full-source groupBy scan+shuffle
        counts = df.groupBy(*cols).agg(
            F.count(F.lit(1)).alias("__rows")
        ).persist()
        total_rows = max(
            1, int(counts.agg(F.sum("__rows").alias("t")).first()["t"] or 0)
        )
        kdf = counts.select(
            *cols,
            F.greatest(
                F.lit(1),
                F.round(
                    F.lit(float(n_files)) * F.col("__rows") / F.lit(float(total_rows))
                ).cast("int"),
            ).alias("__k"),
        )
        try:
            n_files = int(kdf.agg(F.sum("__k").alias("s")).first()["s"])
            right = kdf
            for c in cols:
                right = right.withColumnRenamed(c, f"__p_{c}")
            cond = None
            for c in cols:
                e = df[c].eqNullSafe(F.col(f"__p_{c}"))
                cond = e if cond is None else cond & e
            (
                df.join(F.broadcast(right), cond, "left")
                .withColumn(
                    "__salt",
                    F.floor(
                        F.rand(42) * F.coalesce(F.col("__k"), F.lit(1))
                    ).cast("int"),
                )
                .repartition(n_files, *cols, F.col("__salt"))
                .drop("__salt", "__k", *[f"__p_{c}" for c in cols])
                .write.mode("overwrite")
                .partitionBy(*cols)
                .parquet(dst)
            )
        finally:
            counts.unpersist()
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files
