"""10x/100x events scale measurement for the Structured Streaming
family (the streaming analogue of the documents/embeddings scale runs
in BASELINE.md).

No sf1 events exist, so the corpus is M time-extended copies of
sf0.1's 100k events: copy k keeps every row but shifts ts by
k*(span+1h) and remaps event_id — the stream gets M times LONGER at
the SAME event rate, which is the scaling that matters for stateful
streaming (state should stay O(rate x watermark window), NOT grow
with total stream length). Each corpus is written as ``4*M``
time-ordered parquet files and streamed with ``maxFilesPerTrigger=4``,
so the M=10 run executes 10 micro-batches whose watermark advances
between batches and evicts window/join state — a single-batch run
would hold the whole corpus in state and prove nothing.

Measures, at M=1, M=10, and M=100 (100 micro-batches, 100 watermark
advances — flat per-event cost over that many evictions is the
strongest state-boundedness proof available on one host), wall to a
drained memory sink (state_partitions=8, the gate sizing):

- tumbling_counts: 1h windows, 2h watermark;
- stream_interval_join: clicks x purchases within 30 min on user_id
  (both sides watermarked; state bounded by rate x (watermark +
  interval)).

Output rows must scale ~M (same per-copy results, M disjoint time
ranges); wall should scale ~linearly with input, NOT superlinearly —
superlinear wall would mean state is accumulating across batches.

Usage: python tools/scale_streaming.py [--quick] [--rocksdb]
  --quick: M=1 and M=10 only (the full run adds M=100).
  --rocksdb: run every drain under the RocksDB state-store provider
    (``state_store='rocksdb'``) — the production knob once stream
    state outgrows executor heap. Row counts must match the default
    provider's runs exactly; wall overhead is the RocksDB
    changelog/snapshot commit cost.
Writes corpora under /tmp/evscale/ and prints one JSON line per M.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1/events.parquet"
OUT_DIR = "/tmp/evscale"
FILES_PER_COPY = 4


def build_corpus(m: int) -> str:
    import pyarrow.parquet as pq

    base = pq.read_table(BASE).to_pandas().sort_values("ts")
    span = (base["ts"].max() - base["ts"].min()) + pd.Timedelta(hours=1)
    parts = []
    for k in range(m):
        c = base.copy()
        c["ts"] = c["ts"] + k * span
        c["event_id"] = c["event_id"] + k * 10_000_000
        parts.append(c)
    allrows = pd.concat(parts, ignore_index=True).sort_values("ts")
    path = os.path.join(OUT_DIR, f"m{m}")
    os.makedirs(path, exist_ok=True)
    n_files = FILES_PER_COPY * m
    per = -(-len(allrows) // n_files)
    for i in range(n_files):
        chunk = allrows.iloc[i * per : (i + 1) * per]
        if len(chunk):
            chunk.to_parquet(
                os.path.join(path, f"part-{i:04d}.parquet"), index=False
            )
    return path


def timed(fn, n=3, warm=True):
    """Median wall of n runs (optional warmup) plus the rows the last
    run produced — no extra execution just to count."""
    if warm:
        fn()
    runs = []
    rows = None
    for _ in range(n):
        t0 = time.perf_counter()
        rows = fn()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3), rows


def main() -> None:
    from pyspark.sql import functions as F

    from vinum_spark.session import get_spark
    from vinum_spark.streaming import stream_events, stream_interval_join
    from vinum_spark.streaming.windows import (
        run_stream_to_memory,
        tumbling_counts,
    )

    spark = get_spark("evscale")
    spark.sparkContext.setLogLevel("ERROR")
    seq = [0]
    store = "rocksdb" if "--rocksdb" in sys.argv[1:] else None

    ms = (1, 10) if "--quick" in sys.argv[1:] else (1, 10, 100)
    for m in ms:
        path = build_corpus(m)

        def tumbling():
            seq[0] += 1
            name = f"evscale_t_{seq[0]}"
            stream = stream_events(
                spark, path, max_files_per_trigger=FILES_PER_COPY
            )
            run_stream_to_memory(
                tumbling_counts(stream), name, state_partitions=8,
                state_store=store,
            )
            return spark.table(name).count()

        def ijoin():
            seq[0] += 1
            name = f"evscale_j_{seq[0]}"
            clicks = stream_events(
                spark, path, max_files_per_trigger=FILES_PER_COPY
            ).filter(F.col("event_type") == "click")
            purchases = stream_events(
                spark, path, max_files_per_trigger=FILES_PER_COPY
            ).filter(F.col("event_type") == "purchase")
            joined = stream_interval_join(
                clicks, purchases, key="user_id", ts_col="ts",
                within="30 minutes",
            )
            run_stream_to_memory(
                joined, name, mode="append", state_partitions=8,
                state_store=store,
            )
            return spark.table(name).count()

        # M=100 runs ~50-120s each: session is warm from the smaller Ms,
        # so skip the dedicated warmup and time a single drain
        n = {1: 3, 10: 2}.get(m, 1)
        wall_t, rows_t = timed(tumbling, n=n, warm=m < 100)
        wall_j, rows_j = timed(ijoin, n=n, warm=m < 100)
        print(
            json.dumps(
                {
                    "m": m,
                    "state_store": store or "default",
                    "micro_batches": m,
                    "tumbling_wall_s": wall_t,
                    "tumbling_rows": int(rows_t),
                    "interval_join_wall_s": wall_j,
                    "interval_join_rows": int(rows_j),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
