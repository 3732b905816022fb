"""StreamReader — the reference's larger-than-memory entry point
(``vinum/api/stream_reader.py:12-94``).

In the reference this is a distinct code path because only the streaming
CSV reader avoids materializing the input. On Spark **every** scan is a
partitioned stream by construction, so ``StreamReader`` is a thin alias
over ``Table``; it exists for API parity. (True event-time streaming
lives in ``vinum_spark.streaming``.)
"""

from __future__ import annotations

from vinum_spark.api.table import Table


class StreamReader(Table):
    """API-parity alias: ``stream_csv(path).sql(...)`` works identically
    to ``read_csv(path).sql(...)`` but advertises the streaming contract
    (no driver-side materialization until ``to_pandas()``)."""
