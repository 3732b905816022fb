"""Structured Streaming tests: stream the events parquet through the
windowed operators and cross-check against the equivalent batch query —
the streaming/batch agreement IS the correctness statement.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vinum_spark.streaming import (
    session_aggregate,
    stream_events,
    tumbling_counts,
)
from vinum_spark.streaming.windows import run_stream_to_memory


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # Re-shard the sf0.001 events into several files so the stream has
    # multiple input splits (ts arrives as TIMESTAMP(NANOS) parquet —
    # rewrite through the inventory loader which normalizes to micros).
    from vinum_spark.inventory import _t

    out = str(tmp_path_factory.mktemp("events_stream"))
    _t(spark, "/root/testdata/sf0.001", "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_tumbling_stream_matches_batch(spark, events_dir):
    stream = stream_events(spark, events_dir)
    assert stream.isStreaming
    run_stream_to_memory(tumbling_counts(stream), "tumbling_out")
    got = (
        spark.table("tumbling_out")
        .orderBy("window_start", "event_type")
        .toPandas()
    )

    batch = spark.read.parquet(events_dir)
    want = (
        tumbling_counts(batch)
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    assert len(got) == len(want) > 0
    assert got["n"].tolist() == want["n"].tolist()
    assert got["event_type"].tolist() == want["event_type"].tolist()


def test_session_stream_runs(spark, events_dir):
    stream = stream_events(spark, events_dir)
    run_stream_to_memory(session_aggregate(stream), "session_out")
    got = spark.table("session_out").toPandas()
    assert len(got) > 0
    assert (got["n_events"] >= 1).all()
    # session bounds are ordered
    assert (got["session_end"] >= got["session_start"]).all()


def test_interval_join_stream_matches_batch(spark, events_dir):
    """Stream-stream inner join with a time-range condition must emit
    exactly the batch-join rows (watermarks only bound state for inner
    joins; they do not change the emitted set)."""
    from vinum_spark.streaming import stream_interval_join

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    sc, sp = split(stream_events(spark, events_dir))
    joined = stream_interval_join(sc, sp, within="30 minutes")
    assert joined.isStreaming
    run_stream_to_memory(joined, "ij_out", mode="append")
    got = (
        spark.table("ij_out")
        .select("l_event_id", "r_event_id")
        .orderBy("l_event_id", "r_event_id")
        .toPandas()
    )

    bc, bp = split(spark.read.parquet(events_dir))
    want = (
        stream_interval_join(bc, bp, within="30 minutes")
        .select("l_event_id", "r_event_id")
        .orderBy("l_event_id", "r_event_id")
        .toPandas()
    )
    assert len(got) == len(want) > 0
    assert got.values.tolist() == want.values.tolist()
