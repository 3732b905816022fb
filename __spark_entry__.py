"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator inventory from
``vinum_spark/inventory.py`` (one entry per SURVEY.md §2 operator class
plus the LLM-pipeline extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vinum_spark import inventory


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return inventory.QUERIES["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return inventory.queries()


def oracle_sql() -> dict[str, str]:
    return inventory.oracle_sql()
