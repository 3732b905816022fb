"""Writer round-trips (extension: the reference has no durable sinks)."""

from __future__ import annotations

import pytest


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    import vinum_spark as vs

    t = vs.read_parquet("/root/testdata/sf0.001/orders.parquet", spark=spark)
    out = str(tmp_path / "orders_out")
    t.write_parquet(out, partition_by=["o_orderpriority"])
    back = vs.read_parquet(out, spark=spark)
    assert back.df.count() == t.df.count()
    # partition pruning works on the hive layout
    pruned = back.df.filter(back.df.o_orderpriority == "1-URGENT")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan


def test_csv_roundtrip(spark, tmp_path):
    import vinum_spark as vs

    t = vs.Table.from_pydict({"a": [1, 2, 3], "b": ["x", "y", "z"]}, spark)
    out = str(tmp_path / "csv_out")
    t.write_csv(out)
    back = vs.read_csv(out, spark=spark)
    assert sorted(back.to_pandas()["a"].tolist()) == [1, 2, 3]


def test_json_roundtrip(spark, tmp_path):
    import vinum_spark as vs

    t = vs.Table.from_pydict({"a": [1, 2], "b": [True, False]}, spark)
    out = str(tmp_path / "json_out")
    t.write_json(out)
    back = vs.read_json(out, spark=spark)
    assert back.df.count() == 2


def test_grouped_agg_udf_api(spark, trips_groupby):
    import numpy as np

    import vinum_spark as vs

    vs.register_numpy_agg("qspread", lambda x: float(np.max(x) - np.min(x)))
    pdf = trips_groupby.sql_pd(
        "select vendor_id, qspread(total) as spread from t "
        "group by vendor_id order by vendor_id"
    )
    assert pdf["spread"].tolist() == pytest.approx([30.97, 130.0, 0.0])


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC reader/writer round trip; columns/filters lower to a pruned,
    pushed-down scan exactly like the parquet path."""
    import vinum_spark as vs
    from vinum_spark.api.table import Table

    t = Table.from_pydict(
        {"id": [1, 2, 3, 4], "grp": ["a", "a", "b", "b"], "v": [1.0, 2.0, 3.0, 4.0]},
        spark=spark,
    )
    out = str(tmp_path / "orc_rt")
    t.write_orc(out, partition_by=["grp"])
    back = vs.read_orc(out, columns=["id", "v"], filters=[("id", ">=", 3)], spark=spark)
    pdf = back.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(pdf.columns) == ["id", "v"]
    assert pdf.id.tolist() == [3, 4]
    plan = back._df._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()
