"""asof_join operator tests (pandas merge_asof is the reference oracle)."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def quote_trade(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", 10.0, 1),
            (5, "A", 11.0, 2),
            (2, "B", 20.0, 3),
            (9, "B", 21.0, 4),
            (1, "C", 30.0, 5),  # no quote at or before → unmatched
        ],
        "ts long, sym string, price double, trade_id long",
    )
    quotes = spark.createDataFrame(
        [
            (0, "A", 9.9, 10),
            (4, "A", 10.9, 11),
            (5, "A", 11.1, 12),  # equal-ts quote must match ts=5 trade
            (3, "B", 19.9, 13),
        ],
        "ts long, sym string, bid double, quote_id long",
    )
    return trades, quotes


def test_asof_backward_inner(quote_trade):
    from vinum_spark.operators.asof import asof_join

    trades, quotes = quote_trade
    out = asof_join(trades, quotes, on="ts", by="sym", how="inner").toPandas()
    got = {
        int(r.trade_id): int(r.quote_id_right) for r in out.itertuples()
    }
    # trade(A, ts=1) → quote 10 (ts=0); trade(A, ts=5) → quote 12 (ts=5, tie
    # inclusive); trade(B, ts=9) → quote 13; trade(B, ts=2) unmatched;
    # trade(C) unmatched.
    assert got == {1: 10, 2: 12, 4: 13}


def test_asof_left_keeps_unmatched(quote_trade):
    from vinum_spark.operators.asof import asof_join

    trades, quotes = quote_trade
    out = asof_join(trades, quotes, on="ts", by="sym", how="left").toPandas()
    assert len(out) == 5
    unmatched = out[out.quote_id_right.isna()].trade_id.tolist()
    assert sorted(unmatched) == [3, 5]


def test_asof_forward(quote_trade):
    from vinum_spark.operators.asof import asof_join

    trades, quotes = quote_trade
    out = asof_join(
        trades, quotes, on="ts", by="sym", direction="forward", how="inner"
    ).toPandas()
    got = {int(r.trade_id): int(r.quote_id_right) for r in out.itertuples()}
    # forward: nearest quote at or after the trade
    assert got[1] == 11  # trade(A, ts=1) → quote ts=4
    assert got[2] == 12  # trade(A, ts=5) → quote ts=5 (tie inclusive)
    assert got[3] == 13  # trade(B, ts=2) → quote ts=3


def test_asof_null_value_columns_carry_atomically(spark):
    """A matched right row whose VALUE column is NULL must come through as
    NULL — not stitched with an older row's non-null value."""
    from vinum_spark.operators.asof import asof_join

    trades = spark.createDataFrame([(3, "A", 1)], "ts long, sym string, trade_id long")
    quotes = spark.createDataFrame(
        [(1, "A", 10.0, 100), (2, "A", None, 101)],
        "ts long, sym string, bid double, quote_id long",
    )
    out = asof_join(trades, quotes, on="ts", by="sym", how="inner").collect()
    assert len(out) == 1
    row = out[0]
    assert row["quote_id_right"] == 101  # the ts=2 row matched...
    assert row["bid_right"] is None  # ...and its NULL bid stayed NULL


def test_asof_matches_pandas_merge_asof(spark):
    from vinum_spark.operators.asof import asof_join

    left = pd.DataFrame(
        {"ts": [1, 3, 7, 12, 15], "k": ["x"] * 5, "lv": range(5)}
    )
    right = pd.DataFrame(
        {"ts": [0, 4, 9, 14], "k": ["x"] * 4, "rv": [100, 101, 102, 103]}
    )
    want = pd.merge_asof(left, right, on="ts", by="k")
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = (
        asof_join(ldf, rdf, on="ts", by="k", how="left")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert got["rv_right"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()
