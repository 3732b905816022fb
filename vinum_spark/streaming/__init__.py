from vinum_spark.streaming.windows import (
    stream_events,
    stream_table,
    tumbling_counts,
    sliding_aggregate,
    session_aggregate,
)
from vinum_spark.streaming.joins import stream_interval_join

__all__ = [
    "stream_events",
    "stream_table",
    "tumbling_counts",
    "sliding_aggregate",
    "session_aggregate",
    "stream_interval_join",
]
