"""Aggregate helpers with reference-parity semantics.

The reference promotes an overflowing ``sum(int64)`` through int128 into
Decimal128(38, 0) automatically (``vinum_cpp/src/operators/aggregate/
agg_funcs.h:319-435`` SumOverflowFunc; ``common/huge_int.h``). Spark's
``sum`` over a long column stays long: with ANSI off it WRAPS silently,
with ANSI on it throws ARITHMETIC_OVERFLOW. Neither matches the
reference — this is the one documented type-semantics divergence in the
engine (SURVEY.md §1.3), with :func:`sum_overflow_safe` as the opt-in
parity shim and ``tests/test_sum_overflow.py`` pinning all three
behaviors.

The shim is opt-in, not the default, deliberately: decimal aggregation
disables whole-stage codegen's long-accumulator fast path, a measurable
cost on 100 TB scans that real non-adversarial data (TPC-H measures,
counters) never needs.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F


def sum_overflow_safe(col: Union[str, Column]) -> Column:
    """``sum`` that cannot overflow int64 — the reference's
    SumOverflowFunc contract (int64 → int128 → Decimal128(38, 0)).

    Accumulates in Decimal(38, 0): 38 digits cover any sum of int64
    values over fewer than ~10¹⁹ rows. Distributes exactly like a
    plain sum (partial decimal sums map-side, one merge), just off the
    long fast path.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,0)"))
