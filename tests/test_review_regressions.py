"""End-to-end regressions for the round-1 self-review findings."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_count_distinct_over_builtin(trips_groupby):
    pdf = trips_groupby.sql_pd(
        "select count(DISTINCT to_int(total)) as n from t"
    )
    assert pdf["n"].tolist() == [5]  # distinct of {2,143,33,53,33,13,33,2}


def test_mixed_arity_np_function(trips_groupby):
    pdf = trips_groupby.sql_pd(
        "select np.round(tax) as r1, np.round(tax, 1) as r2 from t order by id limit 2"
    )
    assert pdf["r1"].tolist() == [0.0, 2.0]
    assert pdf["r2"].tolist() == [0.4, 2.0]


def test_reversed_null_comparison_e2e(trips_nulls):
    pdf = trips_nulls.sql_pd("select id from t where NULL = name order by id")
    assert pdf["id"].tolist() == [2, 5]


def test_case_end_concat_e2e(trips_groupby):
    pdf = trips_groupby.sql_pd(
        "select CASE WHEN vendor_id = 1 THEN 'one' ELSE 'many' END || '-' || vendor_id as c "
        "from t order by id limit 3"
    )
    assert pdf["c"].tolist() == ["one-1", "many-2", "one-1"]


def test_stddev_orderby_global_agg(trips_groupby):
    # extension aggregate + ORDER BY on its alias must not get the
    # stable-sort row-id appended
    pdf = trips_groupby.sql_pd("select stddev(total) as s from t order by s")
    assert len(pdf) == 1


# --------------------------------------------------------------------------
# Round-2 advisor findings
# --------------------------------------------------------------------------


def test_varying_udf_tail_arg_raises(trips_groupby):
    """np.round(x, d) with a COLUMN d must raise (as numpy/the reference
    do), not silently apply the batch's first d to every row."""
    with pytest.raises(Exception):
        trips_groupby.sql_pd("select np.round(tax, vendor_id) as r from t")


def test_constant_udf_tail_arg_still_works(trips_groupby):
    pdf = trips_groupby.sql_pd(
        "select np.round(tax, 1) as r from t order by id limit 2"
    )
    assert pdf["r"].tolist() == [0.4, 2.0]


@pytest.mark.parametrize(
    "expr,want",
    [
        ("5 % 2", 1),
        ("5 % -2", -1),   # np.mod: sign follows divisor
        ("-5 % 2", 1),
        ("-5 % -2", -1),
        ("4 % 2", 0),
        ("0 % -3", 0),
    ],
)
def test_modulo_divisor_sign_semantics(trips, expr, want):
    pdf = trips.sql_pd(f"select {expr} as m from t limit 1")
    assert pdf["m"].tolist() == [want]


def test_asof_duplicate_right_ts_deterministic(spark):
    """Multiple right rows at the same (by, ts): carried payload must not
    depend on input partitioning/order."""
    from vinum_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (1, 20)], "k int, ts int")
    dup_rows = [(1, 10, "a"), (1, 10, "b"), (1, 10, "c"), (1, 5, "z")]
    outs = []
    for order in (dup_rows, dup_rows[::-1]):
        right = spark.createDataFrame(order, "k int, ts int, v string").repartition(
            len(outs) + 1
        )
        out = asof_join(left, right, on="ts", by="k").orderBy("ts")
        outs.append([r["v_right"] for r in out.collect()])
    assert outs[0] == outs[1]
    # both left rows see the same winning duplicate
    assert outs[0][0] == outs[0][1]


def test_udf_session_state_weakkeyed():
    import weakref

    from vinum_spark.functions import udf as udf_mod

    assert isinstance(udf_mod._SESSION_STATE, weakref.WeakKeyDictionary)


def test_minhash_no_overflow_under_ansi(spark):
    from vinum_spark.operators import minhash_lsh_dedup

    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e"), (2, "x y z w v")],
        "doc_id long, text string",
    )
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        kept = minhash_lsh_dedup(docs, n_hashes=16, bands=8).count()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    assert kept == 2  # doc 1 deduped, no ARITHMETIC_OVERFLOW
