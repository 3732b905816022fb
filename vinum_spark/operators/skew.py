"""Skew-handling utilities for hot keys at scale.

AQE's skew-join splitting (on by default in ``vinum_spark.session``)
covers sort-merge joins; these helpers cover the cases AQE does not:
skewed aggregations and skewed broadcast-ineligible joins, via explicit
salting. Both are pure DataFrame compositions — deterministic results,
two-phase execution.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, keys: Sequence[str], salt_buckets: int = 32
) -> DataFrame:
    """COUNT per key that survives arbitrarily hot keys.

    Phase 1 aggregates (key, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 sums the partials per key. Same
    result as a direct groupBy().count(), bounded per-task input.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    partial = df.select(*keys, salt).groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").cast("bigint").alias("n"))


def salted_sum(
    df: DataFrame, keys: Sequence[str], value_col: str, salt_buckets: int = 32
) -> DataFrame:
    """SUM per key, salted two-phase (see salted_count)."""
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    partial = df.select(*keys, value_col, salt).groupBy(*keys, "__salt").agg(
        F.sum(value_col).alias("__partial")
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(f"sum_{value_col}"))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join when the build side is too large to broadcast.

    The left (skewed) side gets a random salt in [0, salt_buckets); the
    right side is replicated ``salt_buckets`` times with every salt value,
    so each (key, salt) partition holds 1/salt_buckets of the hot key's
    rows. Replication cost: right side × salt_buckets — pick the smaller
    side as ``right``.
    """
    lsalted = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    rsalted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = lsalted.join(rsalted, on=[key, "__salt"], how=how)
    return out.drop("__salt")
