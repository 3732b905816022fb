"""Shared fixtures: one local SparkSession, the reference's three golden
fixture tables (ported from ``/root/reference/vinum/tests/conftest.py``),
and the column-wise comparator (floats via np.allclose(equal_nan=True),
reference comparator at conftest.py:128-142).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest


def rows_to_columns_dict(rows, column_names):
    return {
        name: [row[i] for row in rows] for i, name in enumerate(column_names)
    }


TRIPS_COLUMNS = (
    "id", "timestamp", "vendor_id", "city_from", "city_to",
    "lat", "lng", "name", "tax", "tip", "total",
)

TRIPS_ROWS = (
    (1, 1596899421, 1, "Berlin", "Munich", 52.51, 13.66, "Joe", 0.43, 1, 2.43),
    (2, 1596999422, 2, "Munich", "Riva", 48.51, 12.3, "Jonas", 2.0, 5.34, 143.15),
    (3, 1597899423, 1, "Riva", "Naples", 44.89, 14.23, "Joseph", 1.59, 11, 33.40),
    (4, 1598899424, 3, "San Francisco", "Naples", 42.89, 15.89, "Joseph", 1.69, 5, 53.1),
)

TRIPS_GROUPBY_COLUMNS = (
    "id", "timestamp", "date", "vendor_id", "city_from", "city_to",
    "lat", "lng", "name", "tax", "tip", "total",
)

TRIPS_GROUPBY_ROWS = (
    (1, 1602127614, "2020-10-08T03:26:54", 1, "Berlin", "Munich",
     52.51, 13.66, "Joe", 0.43, 1, 2.43),
    (2, 1602217613, "2020-10-09T04:26:53", 2, "Munich", "Riva",
     48.51, 12.3, "Jonas", 2.0, 4.34, 143.15),
    (3, 1602304012, "2020-10-10T04:26:52", 1, "Riva", "Naples",
     44.89, 14.23, "Joseph", 1.59, 11, 33.40),
    (4, 1602390411, "2020-10-11T04:26:51", 3, "San Francisco", "Naples",
     42.89, 15.89, "Joseph", 1.69, 5.3, 53.1),
    (5, 1602476810, "2020-10-12T04:26:50", 1, "Berlin", "Riva",
     44.89, 14.23, "Joseph", 1.59, 11, 33.40),
    (6, 1602563209, "2020-10-13T04:26:49", 2, "Munich", "Riva",
     48.51, 12.3, "Jonas", 2.0, 5.34, 13.15),
    (7, 1602649608, "2020-10-14T04:26:48", 1, "Berlin", "Munich",
     44.89, 14.23, "Joseph", 1.59, 11, 33.40),
    (8, 1602736007, "2020-10-15T04:26:47", 1, "Berlin", "Munich",
     52.51, 13.66, "Joe", 0.43, 0.4, 2.43),
)

TRIPS_NULLS_COLUMNS = (
    "id", "timestamp", "date", "is_vendor", "city_from", "city_to",
    "lat", "lng", "name", "total",
)

TRIPS_NULLS_ROWS = (
    (1, 1602127614, None, True, None, "Munich", 52.51, 13.66, "Joe", None),
    (2, 1602217613, "2020-10-09T04:26:53", True, "Munich", "Riva",
     48.51, 12.3, None, 143.15),
    (3, 1602304012, "2020-10-10T04:26:52", False, None, "Naples",
     44.89, 14.23, "Joseph", 33.40),
    (4, 1602390411, "2020-10-11T04:26:51", None, "San Francisco", "Naples",
     42.89, 15.89, "Joseph", 53.1),
    (5, None, "2020-10-12T04:26:50", True, "Berlin", "Riva",
     44.89, 14.23, None, np.nan),
    (6, 1602563209, "2020-10-13T04:26:49", None, "Munich", "Riva",
     48.51, 12.3, "Jonas", None),
    (7, None, None, None, "Berlin", "Munich", 44.89, 14.23, "Joseph", 33.40),
    (8, 1602736007, "2020-10-15T04:26:47", None, "Berlin", "Munich",
     52.51, 13.66, "Joe", np.nan),
)


@pytest.fixture(scope="session")
def spark():
    from vinum_spark.session import get_spark

    s = get_spark("vinum_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def trips(spark):
    from vinum_spark import Table

    return Table.from_pydict(
        rows_to_columns_dict(TRIPS_ROWS, TRIPS_COLUMNS), spark
    )


@pytest.fixture(scope="session")
def trips_groupby(spark):
    from vinum_spark import Table

    return Table.from_pydict(
        rows_to_columns_dict(TRIPS_GROUPBY_ROWS, TRIPS_GROUPBY_COLUMNS), spark
    )


@pytest.fixture(scope="session")
def trips_nulls(spark):
    from vinum_spark import Table

    return Table.from_pydict(
        rows_to_columns_dict(TRIPS_NULLS_ROWS, TRIPS_NULLS_COLUMNS), spark
    )


def _to_comparable(values) -> np.ndarray:
    arr = np.asarray(values)
    if arr.dtype == object:
        cleaned = []
        for v in values:
            if isinstance(v, (dt.date, dt.datetime, np.datetime64, pd.Timestamp)):
                cleaned.append(pd.Timestamp(v).to_datetime64())
            else:
                cleaned.append(v)
        arr = np.asarray(cleaned)
    if arr.dtype.kind == "M":
        arr = arr.astype("datetime64[ns]")
    return arr


def assert_result_equal(pdf: pd.DataFrame, expected: dict, ordered: bool) -> None:
    assert list(pdf.columns) == list(expected.keys()), (
        f"columns {list(pdf.columns)} != {list(expected.keys())}"
    )
    n = len(next(iter(expected.values()))) if expected else 0
    assert len(pdf) == n, f"rows {len(pdf)} != {n}"
    exp_df = pd.DataFrame({k: list(v) for k, v in expected.items()})
    if not ordered and n > 1:
        key_cols = list(pdf.columns)
        pdf = pdf.iloc[
            pdf.astype(str).sort_values(key_cols).index
        ].reset_index(drop=True)
        exp_df = exp_df.iloc[
            exp_df.astype(str).sort_values(key_cols).index
        ].reset_index(drop=True)
    for col in expected:
        got = _to_comparable(pdf[col].to_list())
        want = _to_comparable(exp_df[col].to_list())
        if got.dtype.kind == "f" or want.dtype.kind == "f":
            assert np.allclose(
                got.astype("float64"), want.astype("float64"), equal_nan=True
            ), f"column {col}: {got} != {want}"
        elif got.dtype.kind == "M" or want.dtype.kind == "M":
            assert np.array_equal(
                got.astype("datetime64[ns]"), want.astype("datetime64[ns]")
            ), f"column {col}: {got} != {want}"
        else:
            same = [
                (a is None and b is None)
                or (a is not None and b is not None and a == b)
                for a, b in zip(got.tolist(), want.tolist())
            ]
            assert all(same), f"column {col}: {got} != {want}"


def run_query_case(tbl, query: str, expected: dict) -> None:
    pdf = tbl.sql_pd(query)
    ordered = "order by" in query.lower()
    assert_result_equal(pdf, expected, ordered)
