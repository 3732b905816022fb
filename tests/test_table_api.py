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


def test_union_order_by_resolves(trips):
    """Fuzz-found regression: a set operation combines branch
    projections, so the stable-sort shim's hidden row-id tiebreaker
    must NOT be appended to a top-level ORDER BY (it cannot resolve in
    the union's output). UNION and UNION ALL both order cleanly."""
    out = trips.sql_pd(
        "select id % 4 as m from t union select id % 3 as m from t"
        " order by m"
    )
    assert out["m"].tolist() == [0, 1, 2, 3]
    out2 = trips.sql_pd(
        "select id as a from t where id > 3"
        " union all select id + 10 as a from t where id < 2"
        " order by a desc"
    )
    assert out2["a"].tolist() == [11, 4]


def test_cte_and_derived_table_order_by_resolve(trips):
    """Same fuzz-found class as the UNION case: CTEs and derived tables
    re-project through their own SELECT lists, so the row-id tiebreaker
    must not be appended there either. Scalar/IN subqueries in WHERE
    keep stabilization (the outer FROM is still the base table)."""
    cte = trips.sql_pd(
        "WITH x AS (SELECT id + 1 AS v FROM t) SELECT v FROM x"
        " ORDER BY v DESC"
    )
    assert cte["v"].tolist() == [5, 4, 3, 2]
    der = trips.sql_pd(
        "SELECT v FROM (SELECT id + 2 AS v FROM t) ORDER BY v"
    )
    assert der["v"].tolist() == [3, 4, 5, 6]
    sub = trips.sql_pd(
        "SELECT id FROM t WHERE id > (SELECT min(id) + 1 FROM t)"
        " ORDER BY id"
    )
    assert sub["id"].tolist() == [3, 4]


def test_order_by_shapes_with_set_ops_and_windows(trips):
    """Probe matrix for the stable-sort shim's edges: SELECT * (the
    hidden row id must not leak into the output), ordinal ORDER BY,
    window functions, EXCEPT with a sort, and the MySQL LIMIT n,m form
    over a set operation."""
    star = trips.sql_pd("SELECT * FROM t ORDER BY id DESC LIMIT 2")
    assert "__vinum_row_id" not in star.columns
    assert star["id"].tolist() == [4, 3]
    win = trips.sql_pd(
        "SELECT id, row_number() OVER (ORDER BY id DESC) AS r FROM t"
        " ORDER BY r"
    )
    assert win["id"].tolist() == [4, 3, 2, 1]
    exc = trips.sql_pd(
        "SELECT id FROM t EXCEPT SELECT id FROM t WHERE id > 2 ORDER BY id"
    )
    assert exc["id"].tolist() == [1, 2]
    # reference doc/source/select.rst: `LIMIT limit, [offset]` — the
    # FIRST number is the count (NOT the MySQL offset-first order)
    lim = trips.sql_pd(
        "SELECT id AS a FROM t UNION ALL SELECT id + 10 AS a FROM t"
        " ORDER BY a LIMIT 3, 1"
    )
    assert lim["a"].tolist() == [2, 3, 4]


def test_from_clause_name_ignored(trips):
    # the reference queries the bound table whatever FROM says
    # (vinum/api/table.py:219-220)
    pdf = trips.sql_pd("select count(*) as n from trips_data")
    assert pdf["n"].tolist() == [4]


def test_explain_runs(trips, capsys):
    trips.explain("select id from t where id > 2")
    captured = capsys.readouterr()
    assert "Physical Plan" in captured.out or captured.out != ""
