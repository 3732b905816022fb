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


class TestPyarrowSignatureParity:
    """The reference's read_csv takes pyarrow option objects positionally
    (vinum/io/arrow.py:64-108) — a first-port call must work unchanged."""

    def test_read_csv_pyarrow_option_objects(self, spark, tmp_path):
        import pyarrow.csv as pacsv
        import vinum_spark as vs

        p = tmp_path / "semi.csv"
        p.write_text("a;b;c\n1;x;2.5\n2;y;3.5\nNA;z;4.5\n")
        t = vs.read_csv(
            str(p),
            pacsv.ReadOptions(),
            pacsv.ParseOptions(delimiter=";"),
            pacsv.ConvertOptions(null_values=["NA"]),
            spark=spark,
        )
        pdf = t.sql_pd("select count(*) as n, count(a) as na, sum(c) as s from t")
        assert pdf["n"].tolist() == [3]
        assert pdf["na"].tolist() == [2]  # 'NA' read as null
        assert pdf["s"].tolist() == [10.5]

    def test_read_csv_column_names_and_types(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.csv as pacsv
        import vinum_spark as vs

        p = tmp_path / "headerless.csv"
        p.write_text("1,7\n2,9\n")
        t = vs.read_csv(
            str(p),
            pacsv.ReadOptions(column_names=["k", "v"]),
            None,
            pacsv.ConvertOptions(column_types={"v": pa.int64()}),
            spark=spark,
        )
        assert dict(t.df.dtypes)["v"] == "bigint"
        pdf = t.sql_pd("select sum(v) as s from t")
        assert pdf["s"].tolist() == [16]

    def test_read_csv_autogenerate_column_names(self, spark, tmp_path):
        import pyarrow.csv as pacsv
        import vinum_spark as vs

        p = tmp_path / "nohdr.csv"
        p.write_text("5,6\n7,8\n")
        t = vs.read_csv(
            str(p), pacsv.ReadOptions(autogenerate_column_names=True), spark=spark
        )
        assert t.df.columns == ["f0", "f1"]  # pyarrow's naming convention

    def test_read_csv_skip_rows_drops_leading_lines(self, spark, tmp_path):
        """pyarrow semantics: skip N physical lines, THEN parse (header
        included in what remains) — cross-checked against pyarrow itself."""
        import pyarrow.csv as pacsv
        import vinum_spark as vs

        p = tmp_path / "x.csv"
        p.write_text("garbage preamble line\na,b\n1,2\n3,4\n")
        t = vs.read_csv(str(p), pacsv.ReadOptions(skip_rows=1), spark=spark)
        assert t.df.columns == ["a", "b"]
        pdf = t.sql_pd("select sum(a) as s, sum(b) as t from t")
        assert pdf["s"].tolist() == [4] and pdf["t"].tolist() == [6]
        # parity with pyarrow on the same file
        pa_tbl = pacsv.read_csv(str(p), read_options=pacsv.ReadOptions(skip_rows=1))
        assert pa_tbl.column_names == ["a", "b"]
        assert sum(pa_tbl["a"].to_pylist()) == 4

    def test_read_csv_skip_rows_unsupported_combos_loud(self, spark, tmp_path):
        """The genuinely unsupported combos still fail loudly: multi-file
        glob paths, newlines_in_values, non-utf8 encodings."""
        import pyarrow.csv as pacsv
        import vinum_spark as vs

        d = tmp_path / "many"
        d.mkdir()
        (d / "x.csv").write_text("a\n1\n")
        with pytest.raises(NotImplementedError, match="single plain file"):
            vs.read_csv(str(d), pacsv.ReadOptions(skip_rows=1), spark=spark)
        p = tmp_path / "x.csv"
        p.write_text("skipme\na\n1\n")
        with pytest.raises(NotImplementedError, match="newlines_in_values"):
            vs.read_csv(
                str(p),
                pacsv.ReadOptions(skip_rows=1),
                pacsv.ParseOptions(newlines_in_values=True),
                spark=spark,
            )
        with pytest.raises(NotImplementedError, match="utf-8"):
            vs.read_csv(
                str(p),
                pacsv.ReadOptions(skip_rows=1, encoding="latin-1"),
                spark=spark,
            )

    def test_read_csv_keyword_form_unchanged(self, spark, tmp_path):
        import vinum_spark as vs

        p = tmp_path / "kw.csv"
        p.write_text("a|b\n1|2\n")
        pdf = vs.read_csv(str(p), delimiter="|", spark=spark).sql_pd(
            "select a + b as s from t"
        )
        assert pdf["s"].tolist() == [3]


    def test_read_csv_column_types_authoritative_over_reinference(
        self, spark, tmp_path
    ):
        """An explicit ConvertOptions.column_types entry must never be
        retyped by sentinel re-inference (pyarrow treats it as
        authoritative): a declared-string code column keeps its leading
        zeros while an undeclared all-numeric column still re-infers."""
        import pyarrow as pa
        import pyarrow.csv as pacsv
        import vinum_spark as vs

        p = tmp_path / "codes.csv"
        p.write_text("code,v\n01,1\n02,NA\n03,2\n")
        t = vs.read_csv(
            str(p),
            None,
            None,
            pacsv.ConvertOptions(
                column_types={"code": pa.string()}, null_values=["NA"]
            ),
            spark=spark,
        )
        types = dict(t.df.dtypes)
        assert types["code"] == "string"  # NOT retyped to bigint
        assert types["v"] == "bigint"  # undeclared column still re-infers
        pdf = t.sql_pd("select code, v from t order by code")
        assert pdf["code"].tolist() == ["01", "02", "03"]  # zeros kept
        assert pdf["v"].isna().tolist() == [False, True, False]

    def test_read_csv_pinned_string_nulls_under_strings_can_be_null(
        self, spark, tmp_path
    ):
        import pyarrow as pa
        import pyarrow.csv as pacsv
        import vinum_spark as vs

        p = tmp_path / "codes2.csv"
        p.write_text("code,v\nNA,1\n02,2\n")
        t = vs.read_csv(
            str(p),
            None,
            None,
            pacsv.ConvertOptions(
                column_types={"code": pa.string()},
                null_values=["NA"],
                strings_can_be_null=True,
            ),
            spark=spark,
        )
        pdf = t.sql_pd("select code from t order by v")
        assert pdf["code"].isna().tolist() == [True, False]
        assert dict(t.df.dtypes)["code"] == "string"

    def test_read_csv_string_pin_without_null_values(self, spark, tmp_path):
        """A string pin alone (no null_values) must still keep raw text
        and still type-infer the unpinned columns — including the
        date/timestamp classes the forced-plain scan skipped."""
        import pyarrow as pa
        import pyarrow.csv as pacsv
        import vinum_spark as vs

        p = tmp_path / "codes3.csv"
        p.write_text("code,v,d\n01,1,2024-01-02\n02,2,2024-01-03\n")
        t = vs.read_csv(
            str(p),
            None,
            None,
            pacsv.ConvertOptions(column_types={"code": pa.string()}),
            spark=spark,
        )
        types = dict(t.df.dtypes)
        assert types == {"code": "string", "v": "bigint", "d": "date"}
        pdf = t.sql_pd("select code from t order by code")
        assert pdf["code"].tolist() == ["01", "02"]


class TestTaxiShapedGoldens:
    """The reference's NYC-taxi IO golden shape (vinum/tests/test_io.py:6-72
    — a ~50k-row group-by with count/min/max/sum/avg over a double plus
    min/max over a timestamp, run identically through the CSV and parquet
    readers) ported onto the driver's lineitem at sf0.01 (~60k rows).
    The same SQL must produce identical results through read_parquet and
    read_csv, both matching a DuckDB oracle on the same bytes."""

    SQL = (
        "select l_linenumber ln, "
        "count(*), "
        "min(l_extendedprice) min_3, "
        "max(l_extendedprice) max_3, "
        "round(sum(l_extendedprice), 2) sum_3, "
        "round(avg(l_extendedprice), 6) avg_3, "
        "min(l_returnflag) min_2, "
        "max(l_linestatus) max_2 "
        "from t group by ln order by ln"
    )
    ORACLE = (
        "SELECT l_linenumber AS ln, count(*) AS count_star, "
        "min(l_extendedprice) AS min_3, max(l_extendedprice) AS max_3, "
        "round(sum(l_extendedprice), 2) AS sum_3, "
        "round(avg(l_extendedprice), 6) AS avg_3, "
        "min(l_returnflag) AS min_2, max(l_linestatus) AS max_2 "
        "FROM src GROUP BY ln ORDER BY ln"
    )
    PARQUET = "/root/testdata/sf0.01/lineitem.parquet"

    @pytest.fixture(scope="class")
    def oracle_pdf(self):
        import duckdb

        return (
            duckdb.connect()
            .execute(
                self.ORACLE.replace(
                    "src", f"read_parquet('{self.PARQUET}')"
                )
            )
            .df()
        )

    def _check(self, pdf, oracle_pdf):
        import numpy as np

        assert list(pdf.columns) == list(oracle_pdf.columns)
        assert len(pdf) == len(oracle_pdf)
        for c in pdf.columns:
            if pdf[c].dtype.kind in "fc":
                assert np.allclose(pdf[c], oracle_pdf[c]), c
            else:
                assert (pdf[c].astype(str) == oracle_pdf[c].astype(str)).all(), c

    def test_parquet_path(self, spark, oracle_pdf):
        import vinum_spark as vs

        t = vs.read_parquet(self.PARQUET, spark=spark)
        self._check(t.sql_pd(self.SQL), oracle_pdf)

    def test_csv_path_same_result(self, spark, oracle_pdf, tmp_path_factory):
        import duckdb
        import vinum_spark as vs

        p = str(tmp_path_factory.mktemp("taxi_golden") / "lineitem.csv")
        duckdb.connect().execute(
            f"COPY (SELECT l_linenumber, l_extendedprice, l_returnflag, l_linestatus "
            f"FROM read_parquet('{self.PARQUET}')) TO '{p}' (HEADER)"
        )
        t = vs.read_csv(p, spark=spark)
        self._check(t.sql_pd(self.SQL), oracle_pdf)
