"""stream_distinct: duplicates injected across separate input files must
come out exactly once."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vinum_spark.streaming import stream_events
from vinum_spark.streaming.stateful import stream_distinct
from vinum_spark.streaming.windows import run_stream_to_memory


@pytest.fixture(scope="module")
def dup_events_dir(spark, tmp_path_factory):
    from vinum_spark.inventory import _t

    out = str(tmp_path_factory.mktemp("dup_events"))
    base = _t(spark, "/root/testdata/sf0.001", "events").limit(500)
    # same 500 events written twice: exact duplicates in separate files
    base.coalesce(1).write.mode("overwrite").parquet(out)
    base.coalesce(1).write.mode("append").parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_stream_distinct_dedups_across_files(spark, dup_events_dir):
    stream = stream_events(spark, dup_events_dir, max_files_per_trigger=1)
    deduped = stream_distinct(stream, group_col="user_id", key_cols=["event_id"])
    run_stream_to_memory(deduped, "distinct_out", mode="append")
    got = spark.table("distinct_out").toPandas()
    assert len(got) == 500  # 1000 input rows, 500 unique event_ids
    assert got["event_id"].is_unique
    # raw input really contains duplicates
    raw = spark.read.parquet(dup_events_dir)
    assert raw.count() == 1000


def test_stream_distinct_state_bounded_by_default():
    """Unbounded state must be the explicit opt-in, never the default
    (at 100 TB/day an ever-growing seen-set is a slow OOM)."""
    import inspect

    from vinum_spark.streaming.stateful import DEFAULT_TIMEOUT_MS

    default = inspect.signature(stream_distinct).parameters["timeout_ms"].default
    assert default == DEFAULT_TIMEOUT_MS > 0


def test_stream_distinct_unbounded_opt_in(spark, dup_events_dir):
    """timeout_ms=0 (explicit) still runs with NoTimeout exact retention."""
    stream = stream_events(spark, dup_events_dir, max_files_per_trigger=1)
    deduped = stream_distinct(
        stream, group_col="user_id", key_cols=["event_id"], timeout_ms=0
    )
    run_stream_to_memory(deduped, "distinct_unbounded_out", mode="append")
    got = spark.table("distinct_unbounded_out").toPandas()
    assert len(got) == 500
    assert got["event_id"].is_unique


def test_dedup_within_watermark_stream_matches_batch(spark, dup_events_dir):
    """Built-in dropDuplicatesWithinWatermark twin: the doubled source
    deduped on event_id must reproduce the single-copy counts (the
    duplicates land within the watermark of their first occurrence)."""
    from vinum_spark.streaming.stateful import stream_dedup_within_watermark

    stream = stream_events(spark, dup_events_dir)
    deduped = stream_dedup_within_watermark(
        stream, key_cols=["event_id"], watermark="1 hour"
    )
    assert deduped.isStreaming
    run_stream_to_memory(deduped, "ddww_out", mode="append")
    got = spark.table("ddww_out")
    n_unique = (
        spark.read.parquet(dup_events_dir).select("event_id").distinct().count()
    )
    assert got.count() == n_unique == 500
    assert got.select("event_id").distinct().count() == n_unique
