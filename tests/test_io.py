"""IO reader tests (reference: ``vinum/tests/test_io.py`` — CSV incl.
compression, JSON, parquet with columns/filters pushdown args)."""

from __future__ import annotations

import gzip
import json

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("io") / "data.csv"
    pd.DataFrame(
        {"id": [1, 2, 3, 4], "name": ["a", "b", "c", "d"], "v": [1.5, 2.5, 3.5, 4.5]}
    ).to_csv(p, index=False)
    return str(p)


def test_read_csv(spark, csv_path):
    import vinum_spark as vs

    t = vs.read_csv(csv_path, spark=spark)
    pdf = t.sql_pd("select id, v from t where id >= 3 order by id")
    assert pdf["id"].tolist() == [3, 4]
    assert pdf["v"].tolist() == [3.5, 4.5]


def test_read_csv_gzip(spark, tmp_path):
    import vinum_spark as vs

    p = tmp_path / "data.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("x,y\n1,10\n2,20\n")
    pdf = vs.read_csv(str(p), spark=spark).sql_pd("select sum(y) as s from t")
    assert pdf["s"].tolist() == [30]


def test_stream_csv_is_streamreader(spark, csv_path):
    import vinum_spark as vs

    sr = vs.stream_csv(csv_path, spark=spark)
    assert isinstance(sr, vs.StreamReader)
    assert sr.sql_pd("select count(*) as n from t")["n"].tolist() == [4]


def test_read_json(spark, tmp_path):
    import vinum_spark as vs

    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        for row in [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]:
            f.write(json.dumps(row) + "\n")
    pdf = vs.read_json(str(p), spark=spark).sql_pd(
        "select a from t where b = 'y'"
    )
    assert pdf["a"].tolist() == [2]


def test_read_parquet_columns_and_filters(spark):
    import vinum_spark as vs

    t = vs.read_parquet(
        "/root/testdata/sf0.001/orders.parquet",
        columns=["o_orderkey", "o_totalprice"],
        filters=[("o_totalprice", ">", 300000.0)],
        spark=spark,
    )
    assert t.column_names == ["o_orderkey", "o_totalprice"]
    pdf = t.to_pandas()
    assert (pdf["o_totalprice"] > 300000.0).all()
    # the filter must be pushed into the scan
    plan = t.df._sc._jvm.PythonSQLUtils.explainString(
        t.df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]


def test_read_parquet_filters_in(spark):
    import vinum_spark as vs

    t = vs.read_parquet(
        "/root/testdata/sf0.001/nation.parquet",
        filters=[("n_regionkey", "in", [0, 1])],
        spark=spark,
    )
    assert set(t.to_pandas()["n_regionkey"].unique()) <= {0, 1}
