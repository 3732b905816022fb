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

    l_tagged = left.withColumn(_SIDE, F.lit(1))
    for c in rmap.values():
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c[: -len(suffix)]]))

    r_tagged = right
    for old, new in rmap.items():
        r_tagged = r_tagged.withColumnRenamed(old, new)
    # keep the timestamp under the left name too — it drives the ordering
    r_tagged = r_tagged.withColumn(on, F.col(rmap[on])).withColumn(_SIDE, F.lit(0))
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    ts_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(ts_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    for new in rmap.values():
        out = out.withColumn(new, F.last(new, ignorenulls=True).over(w))
    out = out.filter(F.col(_SIDE) == 1).drop(_SIDE)
    if how == "inner":
        match_ts = rmap.get(on)
        probe = match_ts if match_ts else next(iter(rmap.values()), None)
        if probe:
            out = out.filter(F.col(probe).isNotNull())
    return out
