"""Stream-stream joins over event streams.

The reference has no streaming at all (``vinum/api/stream_reader.py``
is out-of-core batch reading); this is a pure Spark-first extension:
a watermarked stream-stream INNER join with an event-time range
condition — the canonical "attribution" shape (every click joined to
the same user's purchases within N minutes).

Scale design: Spark buffers both sides' unmatched rows in join state
keyed by the equi-join key; the time-range condition plus BOTH
watermarks let the engine compute a state-eviction bound, so state is
O(input-rate × (watermark + interval)) instead of unbounded. The join
itself shuffles both streams once on the key — the same single-shuffle
shape as the batch equi-join. For an inner join with a time constraint
the emitted rows are exactly the batch-join rows, so results are
cross-checkable against a batch/DuckDB oracle on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join two event streams on ``key`` where the right event's
    timestamp falls in ``[left.ts, left.ts + within]``.

    Both inputs may be streaming or batch DataFrames (the streaming
    unit tests pin stream==batch equality). Columns are prefixed
    ``l_``/``r_`` to keep the joined schema unambiguous. Watermarks are
    applied to both sides BEFORE the join — required by Spark to bound
    join state; ``within`` must parse as a Spark interval literal
    (e.g. ``'30 minutes'``).
    """
    l = left.withWatermark(ts_col, watermark).select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    r = right.withWatermark(ts_col, watermark).select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    lts, rts = F.col(f"l_{ts_col}"), F.col(f"r_{ts_col}")
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner")
