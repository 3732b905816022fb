"""Table API tests (reference: ``vinum/tests/test_table_api.py``)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest


def test_from_pydict_roundtrip(spark):
    from vinum_spark import Table

    t = Table.from_pydict({"a": [1, 2, 3], "b": ["x", "y", "z"]}, spark)
    pdf = t.to_pandas()
    assert pdf["a"].tolist() == [1, 2, 3]
    assert pdf["b"].tolist() == ["x", "y", "z"]
    assert t.column_names == ["a", "b"]


def test_from_pandas_roundtrip(spark):
    from vinum_spark import Table

    src = pd.DataFrame({"a": [1.5, 2.5], "b": [True, False]})
    t = Table.from_pandas(src, spark)
    out = t.to_pandas()
    assert out["a"].tolist() == [1.5, 2.5]
    assert out["b"].tolist() == [True, False]


def test_from_arrow_roundtrip(spark):
    from vinum_spark import Table

    src = pa.Table.from_pydict({"a": [1, None, 3]})
    t = Table.from_arrow(src, spark)
    arrow = t.to_arrow()
    assert arrow.column("a").to_pylist() == [1, None, 3]


def test_head(spark, trips):
    head_df = trips.head(2)
    assert head_df.shape == (2, 11)


def test_schema(trips):
    names = [f.name for f in trips.schema.fields]
    assert names[:3] == ["id", "timestamp", "vendor_id"]


def test_sql_returns_lazy_table(trips):
    out = trips.sql("select id from t where id > 2")
    from vinum_spark import Table

    assert isinstance(out, Table)
    assert out.to_pandas()["id"].tolist() == [3, 4]


def test_from_clause_name_ignored(trips):
    # the reference queries the bound table whatever FROM says
    # (vinum/api/table.py:219-220)
    pdf = trips.sql_pd("select count(*) as n from trips_data")
    assert pdf["n"].tolist() == [4]


def test_explain_runs(trips, capsys):
    trips.explain("select id from t where id > 2")
    captured = capsys.readouterr()
    assert "Physical Plan" in captured.out or captured.out != ""
