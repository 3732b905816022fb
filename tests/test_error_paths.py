"""Reference error-path suite port (reference test_query_results.py:
1500-1566): queries the reference rejects must raise here too — EXCEPT
where Spark semantics are strictly more capable, which are pinned as
documented EXCEEDS-reference divergences instead."""

from __future__ import annotations

import pytest


# --- reference raises AND we raise -----------------------------------------


@pytest.mark.parametrize(
    "query",
    [
        # mixed aggregate / full-column select without GROUP BY
        # (reference: test_select_exprs_different_sizes)
        "select city_from, count(total>100) from t",
        # missing column / missing UDF (reference: test_column_not_found)
        "select bla from t",
        "select udf_missing(vendor_id) from t",
        "select udf_missing(vendor_id) from t group by vendor_id",
    ],
)
def test_invalid_queries_raise(trips_groupby, query):
    with pytest.raises(Exception):
        trips_groupby.sql_pd(query)


@pytest.mark.parametrize(
    "query",
    [
        # non-grouped columns in a grouped select
        # (reference: test_non_groupby_columns_in_select)
        "select city_to, city_from, count(*) from t group by city_from",
        "select city_from, total > 20, count(*) from t group by city_from",
        "select np.sin(lat), city_from from t group by city_from",
        "select city_from, count(*) from t group by total > 20",
    ],
)
def test_non_groupby_columns_raise(trips_groupby, query):
    with pytest.raises(Exception):
        trips_groupby.sql_pd(query)


# --- reference raises, we EXCEED (valid SQL, Spark semantics) ---------------


def test_group_by_expression_in_select_exceeds_reference(trips_groupby):
    """Reference rejects selecting the GROUP BY expression itself
    (test_non_groupby_columns_in_select case 5); standard SQL allows it
    — documented EXCEEDS-reference divergence."""
    pdf = trips_groupby.sql_pd(
        "select total > 20 as big, 4 as four from t group by total > 20 "
        "order by big"
    )
    assert pdf["big"].tolist() == [False, True]
    assert pdf["four"].tolist() == [4, 4]


@pytest.mark.parametrize(
    "query,expected_vendors",
    [
        # vendor counts in the fixture: 1 -> 5 rows, 2 -> 2, 3 -> 1
        ("select vendor_id from t group by vendor_id having count(*) = 5", [1]),
        ("select vendor_id from t group by vendor_id having count(*) > 1", [1, 2]),
    ],
)
def test_having_aggregate_not_in_select_exceeds_reference(
    trips_groupby, query, expected_vendors
):
    """Reference rejects HAVING over an aggregate absent from the select
    list (test_non_groupby_columns_in_select cases 6-7); standard SQL
    allows it — documented EXCEEDS-reference divergence."""
    pdf = trips_groupby.sql_pd(query)
    assert sorted(pdf["vendor_id"].tolist()) == expected_vendors
