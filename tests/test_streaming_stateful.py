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
