"""Pins the documented sum(int64) overflow divergence (SURVEY.md §1.3).

Reference behavior: sum over int64 promotes through int128 into
Decimal128(38,0) on overflow and returns the TRUE sum
(vinum_cpp/src/operators/aggregate/agg_funcs.h:319-435 SumOverflowFunc).

Spark behavior: sum(long) stays long — ANSI off wraps silently, ANSI on
throws ARITHMETIC_OVERFLOW. The opt-in parity shim is
vinum_spark.functions.sum_overflow_safe.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

I64_MAX = 2**63 - 1


@pytest.fixture()
def overflowing(spark):
    # two near-max values: true sum = 2*(I64_MAX - 1) overflows int64
    return spark.createDataFrame(
        [(I64_MAX - 1,), (I64_MAX - 1,)], "v long"
    )


def test_spark_long_sum_wraps_with_ansi_off(spark, overflowing):
    """The divergence itself: Spark returns the WRAPPED value where the
    reference would promote to Decimal128 and return the true sum."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    got = overflowing.agg(F.sum("v").alias("s")).collect()[0]["s"]
    true_sum = 2 * (I64_MAX - 1)
    assert got != true_sum          # NOT the reference's answer
    assert got == true_sum - 2**64  # two's-complement wrap


def test_spark_long_sum_throws_under_ansi(spark, overflowing):
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(Exception, match="(?i)overflow"):
            overflowing.agg(F.sum("v")).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")


def test_sum_overflow_safe_matches_reference_contract(spark, overflowing):
    """The opt-in shim returns the true sum as Decimal — the reference's
    SumOverflowFunc result."""
    from vinum_spark.functions import sum_overflow_safe

    row = overflowing.agg(sum_overflow_safe("v").alias("s")).collect()[0]
    assert row["s"] == Decimal(2 * (I64_MAX - 1))


def test_sum_overflow_safe_partial_aggregates(spark, overflowing):
    """The shim must keep map-side partial aggregation (it is still one
    hash aggregate pair, just with a decimal accumulator)."""
    from vinum_spark.functions import sum_overflow_safe

    df = overflowing.groupBy().agg(sum_overflow_safe("v"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("HashAggregate") >= 2
