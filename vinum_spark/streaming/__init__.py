from vinum_spark.streaming.windows import (
    stream_events,
    tumbling_counts,
    sliding_aggregate,
    session_aggregate,
)

__all__ = [
    "stream_events",
    "tumbling_counts",
    "sliding_aggregate",
    "session_aggregate",
]
