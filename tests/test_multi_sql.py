"""Multi-table SQL entry point (join/subquery extension surface)."""

from __future__ import annotations

import pytest


def test_two_table_join(spark):
    import vinum_spark as vs

    orders = vs.read_parquet("/root/testdata/sf0.001/orders.parquet", spark=spark)
    customer = vs.read_parquet("/root/testdata/sf0.001/customer.parquet", spark=spark)
    out = vs.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n, round(sum(o.o_totalprice), 2) AS spend
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
        """,
        orders=orders,
        customer=customer,
    ).to_pandas()
    assert len(out) >= 3
    assert (out["n"] > 0).all()


def test_prepass_applies_in_multi_sql(spark):
    import vinum_spark as vs

    li = vs.read_parquet("/root/testdata/sf0.001/lineitem.parquet", spark=spark)
    out = vs.sql(
        "SELECT count(*), np.log(sum(l_quantity)) FROM lineitem",
        lineitem=li,
    ).to_pandas()
    assert list(out.columns) == ["count_star", "np.log"]
    assert out["count_star"].iloc[0] == 6000


def test_requires_tables(spark):
    import vinum_spark as vs

    with pytest.raises(ValueError):
        vs.sql("SELECT 1")
