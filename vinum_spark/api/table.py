"""The ``Table`` API — the reference's only queryable object
(``vinum/api/table.py:15-93``) backed here by a lazy Spark DataFrame.

Differences by design (Spark-first, not a port):

- A ``Table`` wraps a **lazy** DataFrame; materialization happens only on
  ``to_pandas()/to_arrow()/head()``, where the reference always
  materializes the full result (``vinum/core/algebra.py:290-295``). On
  100 TB this laziness is the point: ``tbl.sql(...)`` composes plans that
  Catalyst optimizes end-to-end (pushdown through chained queries).
- The FROM clause may name any table; like the reference
  (``vinum/api/table.py:219-220``) the queried table is this one — we
  register the DataFrame as a temp view both under ``t`` and under the
  FROM name so either works.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from vinum_spark.session import get_spark
from vinum_spark.sqlprep.naming import output_column_names
from vinum_spark.sqlprep.rewrite import rewrite_sql
from vinum_spark.sqlprep.tokens import KIND_IDENT, tokenize
from vinum_spark.functions.udf import ensure_udfs_registered, registered_udf_names

if TYPE_CHECKING:
    import pandas as pd
    import pyarrow as pa


class Table:
    """Named columns of equal length, queryable with SQL."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- ingestion ---------------------------------------------------------

    @classmethod
    def from_pydict(cls, data: Dict[str, list], spark: Optional[SparkSession] = None) -> "Table":
        import pyarrow as pa

        return cls.from_arrow(pa.Table.from_pydict(data), spark)

    @classmethod
    def from_pandas(cls, pdf: "pd.DataFrame", spark: Optional[SparkSession] = None) -> "Table":
        spark = spark or get_spark()
        return cls(spark.createDataFrame(pdf))

    @classmethod
    def from_arrow(cls, tbl: "pa.Table", spark: Optional[SparkSession] = None) -> "Table":
        spark = spark or get_spark()
        try:
            # Spark 4: native Arrow ingestion (zero pandas hop).
            df = spark.createDataFrame(tbl)
        except Exception:
            df = spark.createDataFrame(tbl.to_pandas())
        return cls(df)

    # -- query -------------------------------------------------------------

    def sql(self, query: str) -> "Table":
        """Run a SQL query against this table and return a new Table.

        Pipeline: pre-pass rewrites → lazy UDF registration → temp views →
        ``spark.sql`` (Catalyst plans/optimizes/executes) → output-name
        normalization per the reference naming contract.
        """
        spark = self._df.sparkSession
        rewritten, np_funcs = rewrite_sql(query, udf_names=registered_udf_names())
        ensure_udfs_registered(spark, np_funcs)
        self._df.createOrReplaceTempView("t")
        from_name = _from_table_name(query)
        if from_name and from_name.lower() != "t":
            self._df.createOrReplaceTempView(from_name)
        out = spark.sql(rewritten)
        names = output_column_names(query)
        if names and len(names) == len(out.columns):
            out = out.toDF(*names)
        return Table(out)

    def sql_pd(self, query: str) -> "pd.DataFrame":
        return self.sql(query).to_pandas()

    def explain(self, query: Optional[str] = None, mode: str = "formatted") -> None:
        (self.sql(query)._df if query else self._df).explain(mode)

    # -- materialization / inspection ---------------------------------------

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def schema(self):
        return self._df.schema

    @property
    def column_names(self) -> List[str]:
        return list(self._df.columns)

    def head(self, n: int = 5) -> "pd.DataFrame":
        return self._df.limit(n).toPandas()

    def to_pandas(self) -> "pd.DataFrame":
        return self._df.toPandas()

    def to_arrow(self) -> "pa.Table":
        try:
            return self._df.toArrow()
        except AttributeError:  # pragma: no cover - pre-4.0 fallback
            import pyarrow as pa

            return pa.Table.from_pandas(self._df.toPandas())

    def to_string(self) -> str:
        return self._df._jdf.showString(20, 20, False)

    def __repr__(self) -> str:
        return f"Table({self._df.schema.simpleString()})"


def _from_table_name(sql: str) -> Optional[str]:
    tokens = tokenize(sql)
    depth = 0
    for i, t in enumerate(tokens):
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        elif depth == 0 and t.is_kw("FROM") and i + 1 < len(tokens):
            nxt = tokens[i + 1]
            if nxt.kind == KIND_IDENT:
                return nxt.text
            return None
    return None
