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


def test_stream_dedup_against_store_batches_see_earlier_acceptances(spark, tmp_path):
    """The store append is what links micro-batches: with one file per
    trigger, a text accepted in batch k must be rejected in batch k+1
    even though no in-memory state exists — and pre-seeded
    fingerprints are rejected from batch 0."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.text import with_fingerprint
    from vinum_spark.streaming.stateful import run_stream_dedup_against_store
    from vinum_spark.streaming.windows import stream_table

    src = str(tmp_path / "src")
    docs = spark.createDataFrame(
        [(i, f"text number {i % 5}") for i in range(20)],
        "doc_id long, text string",
    )  # 5 distinct texts, repeated across the id range
    docs.repartitionByRange(4, "doc_id").write.parquet(src)
    seed = with_fingerprint(
        docs.filter("doc_id % 5 = 0"), "text"  # seeds text 0
    ).select("fingerprint").distinct()
    store, out, ckpt = (
        str(tmp_path / "store"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    seed.write.parquet(store)
    stream = stream_table(spark, src, max_files_per_trigger=1)
    run_stream_dedup_against_store(
        stream, store, out, ckpt, state_partitions=2
    )
    got = sorted(
        r["fingerprint"]
        for r in spark.read.parquet(out).select("fingerprint").collect()
    )
    want = sorted(
        r["fingerprint"]
        for r in with_fingerprint(
            docs.filter("doc_id % 5 != 0"), "text"
        ).select("fingerprint").distinct().collect()
    )
    # exactly one survivor per non-seeded distinct text, across 4
    # micro-batches with no in-memory state
    assert got == want and len(got) == 4
    n_store = spark.read.parquet(store).distinct().count()
    assert n_store == 5
