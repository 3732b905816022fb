"""As-of (time-travel) join — an operator Spark lacks natively.

``asof_join(left, right)`` matches each left row with the most recent
right row at or before its timestamp within the same key group
(``direction='backward'``; ``'forward'`` mirrors it).

Implementation is a composition of existing DataFrame ops — NOT a range
join and NOT a pairwise join:

1. union the two inputs with a side tag (right rows sort before left on
   timestamp ties so '<=' semantics hold);
2. one window pass per key group ordered by (ts, side): ``last(col,
   ignorenulls=True)`` carries every right column forward onto left rows;
3. keep left rows, optionally dropping unmatched (inner).

Cost model at 100 TB: exactly ONE shuffle (hash on the key columns) +
a per-partition sort — the same price as a regular co-partitioned join,
with no risk of range-explosion. Skewed keys are split by AQE.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def _is_hashable(dt) -> bool:
    """Whether ``xxhash64`` accepts a column of this type (MapType is
    rejected at analysis time, including maps nested in structs/arrays)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _is_hashable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_is_hashable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Union[str, Sequence[str], None] = None,
    direction: str = "backward",
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """Join ``left`` to the temporally nearest preceding (or following)
    ``right`` row per key.

    Parameters mirror pandas ``merge_asof``: ``on`` = timestamp column
    (must exist in both), ``by`` = equality key column(s), ``direction`` ∈
    {'backward', 'forward'}, ``how`` ∈ {'inner', 'left'}. Right columns
    (except ``by``) come back suffixed.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    by_cols: List[str] = [by] if isinstance(by, str) else list(by or [])

    carried = [c for c in right.columns if c not in by_cols]
    rmap = {c: f"{c}{suffix}" for c in carried}
    payload = "__asof_payload"

    # All right columns travel as ONE struct so the carry is atomic: a
    # right row whose value columns are legitimately NULL still carries as
    # a (non-null) struct — per-column last(ignorenulls) would stitch
    # fields from DIFFERENT right rows.
    # backtick-quote carried names so columns containing dots resolve as
    # literal names, not nesting paths
    r_tagged = right.select(
        *by_cols,
        F.col(on),
        F.struct(
            *[F.col(f"`{c}`").alias(c) for c in carried]
        ).alias(payload),
    ).withColumn(_SIDE, F.lit(0))
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    # cast by DataType object, not the dtypes string — a struct type's
    # simpleString is not re-parseable when field names contain dots
    payload_type = r_tagged.schema[payload].dataType
    l_tagged = left.withColumn(_SIDE, F.lit(1)).withColumn(
        payload, F.lit(None).cast(payload_type)
    )

    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    ts_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    # Final tiebreak: when several RIGHT rows share the same (by, ts), the
    # (ts, side) ordering alone is not total and which payload carries
    # would depend on partitioning. xxhash64 of the payload fields makes
    # the order deterministic: the duplicate with the LARGEST payload hash
    # wins. Left rows all hash the same null payload, and their mutual
    # order is irrelevant (each just reads the carry at its own frame end).
    # Only HASHABLE payload fields participate: xxhash64 rejects MapType
    # (and maps nested anywhere in a type) at analysis time, and an asof
    # join carrying a map column must still work — such fields simply
    # don't contribute to the tiebreak. If no field is hashable the order
    # of exact (by, ts) right-duplicates falls back to partition order,
    # the pre-tiebreak behavior.
    # getField (not F.col("a.b")) so payload field names containing dots
    # or other special characters resolve correctly
    hashable = [
        F.col(payload).getField(f.name)
        for f in r_tagged.schema[payload].dataType.fields
        if _is_hashable(f.dataType)
    ]
    order_keys = [ts_order, F.col(_SIDE).asc()]
    if hashable:
        order_keys.append(F.xxhash64(*hashable).asc())
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        unioned.withColumn(payload, F.last(payload, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE)
    )
    if how == "inner":
        out = out.filter(F.col(payload).isNotNull())
    for old, new in rmap.items():
        out = out.withColumn(new, F.col(payload).getField(old))
    return out.drop(payload)
