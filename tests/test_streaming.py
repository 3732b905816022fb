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


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Real watermark semantics across microbatches: once a window's
    state is evicted (watermark passed its end and the finalized row
    was appended), a late event for that window arriving in a later
    batch is DROPPED — it neither mutates the emitted row nor
    re-creates state (which would append a duplicate window). Batch
    recomputation, with no watermark cutoff, would count it.

    Empirical note: a late row arriving while its window's state is
    still alive (eviction happens at end-of-batch) IS merged — so the
    drop needs the eviction to have happened in an earlier batch,
    hence the three-file structure.
    """
    import time as _time

    from vinum_spark.streaming import stream_events, tumbling_counts
    from vinum_spark.streaming.windows import run_stream_to_memory

    src = str(tmp_path / "late_events")

    def ev(i, ts):
        return (i, ts, 1, "click", 1.0, "{}")

    ddl_raw = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )

    def frame(rows):
        return spark.createDataFrame(rows, ddl_raw).select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )

    # batch 0: three rows in window [10:00, 11:00), max ts 12:00
    # -> watermark for batch 1 = 11:30
    a = frame(
        [
            ev(1, "2024-01-01 10:05:00"),
            ev(2, "2024-01-01 10:20:00"),
            ev(3, "2024-01-01 10:40:00"),
            ev(4, "2024-01-01 12:00:00"),
        ]
    )
    # batch 1: watermark 11:30 > 11:00 finalizes + evicts [10:00,11:00)
    b = frame([ev(6, "2024-01-01 15:00:00")])
    # batch 2: a LATE row for the evicted window -> dropped
    c = frame([ev(5, "2024-01-01 10:30:00")])
    a.coalesce(1).write.mode("overwrite").parquet(src)
    _time.sleep(1.1)  # file-source batches order by modification time
    b.coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    c.coalesce(1).write.mode("append").parquet(src)

    stream = stream_events(spark, src, max_files_per_trigger=1)
    agg = tumbling_counts(stream, window="1 hour", watermark="30 minutes")
    run_stream_to_memory(agg, "late_out", mode="append")
    pdf = spark.table("late_out").toPandas()
    got = pdf.set_index(pdf.window_start.astype(str))
    # the late row (event 5) is excluded and no duplicate window row
    # was appended
    assert int(got.loc["2024-01-01 10:00:00"].n) == 3
    assert (pdf.window_start.astype(str) == "2024-01-01 10:00:00").sum() == 1
    # batch recomputation (no watermark cutoff) WOULD count it
    batch_n = (
        tumbling_counts(spark.read.parquet(src), window="1 hour")
        .filter(F.col("window_start") == "2024-01-01 10:00:00")
        .select("n")
        .collect()[0][0]
    )
    assert batch_n == 4


def test_run_stream_to_parquet_file_sink(spark, events_dir, tmp_path):
    """Windowed aggregation drained to a checkpointed parquet file sink:
    finalized windows land as files; re-running with the same checkpoint
    is a no-op (exactly-once via the sink commit log)."""
    from vinum_spark.streaming import stream_events, tumbling_counts
    from vinum_spark.streaming.windows import run_stream_to_parquet

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    agg = tumbling_counts(stream_events(spark, events_dir))
    run_stream_to_parquet(agg, out, ckpt)
    first = spark.read.parquet(out).count()
    assert first > 0
    # same checkpoint -> no new input -> no duplicate rows
    agg2 = tumbling_counts(stream_events(spark, events_dir))
    run_stream_to_parquet(agg2, out, ckpt)
    assert spark.read.parquet(out).count() == first


def test_quality_and_sampling_operators_compose_with_readstream(spark, tmp_path):
    """The map-side pipeline operators (quality rules, PII redaction,
    deterministic sampling, shard assignment) are plain projections and
    filters, so the SAME operator code must run unchanged on a
    readStream source — the property that lets one pipeline definition
    serve both batch backfill and streaming ingest at 100 TB."""
    import pandas as pd

    from vinum_spark.operators import (
        deterministic_sample,
        with_pii_redacted,
        with_quality_rules,
        with_shard,
    )

    src = str(tmp_path / "docs_src")
    import os

    os.makedirs(src, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": list(range(40)),
            "text": [f"a perfectly ordinary document number {i}" for i in range(40)],
        }
    ).to_parquet(src + "/part0.parquet")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)

    piped = with_shard(
        deterministic_sample(
            with_pii_redacted(with_quality_rules(stream)), "doc_id", 0.5, seed="s"
        ),
        "doc_id",
        4,
        seed="s2",
    )
    assert piped.isStreaming
    run_stream_to_memory(piped, "pipe_out", mode="append")
    got = spark.table("pipe_out").toPandas()

    batch = with_shard(
        deterministic_sample(
            with_pii_redacted(with_quality_rules(spark.read.parquet(src))),
            "doc_id",
            0.5,
            seed="s",
        ),
        "doc_id",
        4,
        seed="s2",
    ).toPandas()
    cols = sorted(batch.columns)
    a = got[cols].sort_values("doc_id").reset_index(drop=True)
    b = batch[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_prepare_corpus_map_side_config_runs_on_readstream(spark, tmp_path):
    """prepare_corpus with a map-side-only config (strip/normalize/
    quality/shard — no dedup, which needs a window) must accept a
    readStream frame and produce the batch result exactly: one pipeline
    definition, batch backfill AND streaming ingest."""
    import os

    import pandas as pd

    from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus

    src = str(tmp_path / "pc_src")
    os.makedirs(src, exist_ok=True)
    pd.DataFrame(
        {
            "doc_id": list(range(30)),
            "text": [f"<p>ordinary streaming document {i}</p>" for i in range(30)],
        }
    ).to_parquet(src + "/part0.parquet")
    cfg = CorpusConfig(
        strip_html=True, normalize=True, quality_filter=True,
        dedup=False, n_shards=4,
    )
    stream_out = prepare_corpus(
        spark.readStream.schema("doc_id long, text string").parquet(src), cfg
    )
    assert stream_out.isStreaming
    run_stream_to_memory(stream_out, "pc_stream_out", mode="append")
    got = spark.table("pc_stream_out").toPandas()
    batch = prepare_corpus(spark.read.parquet(src), cfg).toPandas()
    cols = sorted(batch.columns)
    a = got[cols].sort_values("doc_id").reset_index(drop=True)
    b = batch[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sliding_aggregate_null_values_average_like_f_avg(spark, tmp_path):
    # review regression: the decimal-exact average must divide by the
    # NON-NULL count (F.avg's contract), while n counts all rows
    import os

    import pandas as pd

    from vinum_spark.streaming.windows import run_stream_to_memory, sliding_aggregate

    src = str(tmp_path / "null_ev")
    os.makedirs(src, exist_ok=True)
    pdf = pd.DataFrame(
        {
            # microsecond unit: pandas defaults to ns, which Spark's
            # schema-pinned stream reader rejects
            "ts": pd.to_datetime(["2024-01-01 00:01:00"] * 2).astype("datetime64[us]"),
            "event_type": ["click", "click"],
            "value": [2.0, None],
        }
    )
    pdf.to_parquet(src + "/p.parquet")
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(src)
    run_stream_to_memory(sliding_aggregate(stream), "null_avg_out")
    row = spark.table("null_avg_out").filter("event_type = 'click'").collect()[0]
    assert row["avg_value"] == 2.0  # not 1.0 (sum/era-count)
    assert row["n"] == 2


def test_drain_returns_with_final_watermark_emission_in_sink(spark, tmp_path):
    """Pins _drain's finality contract (VERDICT r7 nit 1): its stop
    condition is the first committed zero-input batch after batch 0,
    which under availableNow is ALSO the batch that carries the final
    watermark-commit emission for append mode. If _drain returned
    before that batch committed, the last finalized window would be
    missing from the sink.

    One input file -> batch 0 consumes everything; the watermark only
    advances AFTER batch 0, so window [10:00,11:00)'s append-mode row
    can only be emitted in the trailing zero-input batch. It must be
    present the moment run_stream_to_memory returns."""
    from vinum_spark.streaming import stream_events, tumbling_counts
    from vinum_spark.streaming.windows import run_stream_to_memory

    src = str(tmp_path / "finality_events")
    ddl_raw = (
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    )
    rows = [
        (1, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 10:20:00", 1, "click", 1.0, "{}"),
        (3, "2024-01-01 12:00:00", 1, "click", 1.0, "{}"),  # advances wm
    ]
    spark.createDataFrame(rows, ddl_raw).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    ).coalesce(1).write.mode("overwrite").parquet(src)

    stream = stream_events(spark, src)
    agg = tumbling_counts(stream, window="1 hour", watermark="30 minutes")
    run_stream_to_memory(agg, "finality_out", mode="append")
    pdf = spark.table("finality_out").toPandas()
    starts = pdf.window_start.astype(str).tolist()
    # the finalized window arrived via the zero-input watermark-commit
    # batch and is in the sink at drain-return
    assert "2024-01-01 10:00:00" in starts
    assert int(pdf.set_index(pdf.window_start.astype(str)).loc[
        "2024-01-01 10:00:00"].n) == 2
    # the still-open window [12:00,13:00) must NOT be there — proves we
    # observed true append-mode finality, not a complete-mode snapshot
    assert "2024-01-01 12:00:00" not in starts


def test_rocksdb_state_store_parity(spark, events_dir):
    """VERDICT r12 item 6: the production state-store knob. The same
    tumbling-window drain under ``state_store='rocksdb'`` (Spark's
    bundled RocksDBStateStoreProvider — off-heap state that spills to
    changelog/snapshot files instead of OOMing) must produce EXACTLY
    the default-provider rows, and the session conf must be restored
    after start. An invalid provider name raises."""
    stream = stream_events(spark, events_dir)
    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    run_stream_to_memory(
        tumbling_counts(stream), "tumbling_rocks", state_store="rocksdb"
    )
    assert spark.conf.get(key, None) == before  # conf restored
    got = (
        spark.table("tumbling_rocks")
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    run_stream_to_memory(
        tumbling_counts(stream_events(spark, events_dir)), "tumbling_hdfs",
        state_store="hdfs",
    )
    want = (
        spark.table("tumbling_hdfs")
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    assert len(got) == len(want) > 0
    assert got["n"].tolist() == want["n"].tolist()
    assert got["event_type"].tolist() == want["event_type"].tolist()

    with pytest.raises(ValueError, match="state_store"):
        run_stream_to_memory(
            tumbling_counts(stream_events(spark, events_dir)), "bad_store",
            state_store="leveldb",
        )


def test_rocksdb_interval_join_parity(spark, events_dir):
    """Stream-stream join state is the heaviest state-store load; the
    RocksDB provider must emit the same joined rows as the default."""
    from vinum_spark.streaming import stream_interval_join

    def run(name, store):
        sc = stream_events(spark, events_dir).filter(
            F.col("event_type") == "click"
        )
        sp = stream_events(spark, events_dir).filter(
            F.col("event_type") == "purchase"
        )
        run_stream_to_memory(
            stream_interval_join(sc, sp, within="30 minutes"), name,
            mode="append", state_store=store,
        )
        return (
            spark.table(name)
            .select("l_event_id", "r_event_id")
            .orderBy("l_event_id", "r_event_id")
            .toPandas()
        )

    got = run("ij_rocks", "rocksdb")
    want = run("ij_default", None)
    assert len(got) == len(want) > 0
    assert got.values.tolist() == want.values.tolist()


def test_prepare_corpus_stream_matches_batch_semantics(spark):
    """The streaming pipeline (readStream -> quality -> watermark dedup
    -> map-side tokenize) must produce EXACTLY the batch semantics on
    the surviving-text level: planted junk filtered, planted same-text
    copies collapsed, every surviving text tokenized identically —
    keyed by fingerprint so arrival order can't leak in. Default
    fingerprint key path (no dedup_cols)."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.pipeline import (
        CorpusConfig,
        prepare_corpus_stream,
    )
    from vinum_spark.operators.text import (
        bpe_tokenize_map_side,
        learn_bpe_merges,
        with_fingerprint,
        with_quality_rules,
    )
    from vinum_spark.streaming.windows import (
        run_stream_to_memory,
        stream_table,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    batch = spark.read.parquet(path)
    merges = learn_bpe_merges(
        batch, n_merges=4, byte_level=True, token_pattern="[^ ]+"
    )
    s1 = stream_table(spark, path).select("doc_id", "text")
    s2 = stream_table(spark, path).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    s3 = stream_table(spark, path).select(
        (F.col("doc_id") + 20_000).alias("doc_id"),
        F.lit("#### # ## #").alias("text"),
    )
    stream = (
        s1.unionByName(s2)
        .unionByName(s3)
        .withColumn(
            "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
        )
    )
    cfg = CorpusConfig(
        quality_filter=True,
        dedup=True,
        tokenize_with=merges,
        tokenize_byte_level=True,
        tokenize_pattern="[^ ]+",
        tokenize_emit_ids=True,
    )
    out = prepare_corpus_stream(stream, cfg, watermark="365 days").select(
        "fingerprint",
        "n_tokens",
        F.md5(F.concat_ws(" ", "tokens")).alias("tok_md5"),
    )
    run_stream_to_memory(out, "pcs_out", mode="append", state_partitions=4)
    got = {tuple(r) for r in spark.table("pcs_out").collect()}

    # batch expectation: the junk doc fails quality; the shifted copy
    # dedups away; one row per distinct fingerprint
    passed = with_quality_rules(batch, col="text").filter("quality_pass")
    dd = (
        with_fingerprint(passed, "text")
        .dropDuplicates(["fingerprint"])
        .select("fingerprint", "text", "doc_id")
    )
    tok = bpe_tokenize_map_side(
        dd, merges, byte_level=True, token_pattern="[^ ]+"
    )
    want = {
        tuple(r)
        for r in tok.select(
            "fingerprint",
            "n_tokens",
            F.md5(F.concat_ws(" ", "tokens")).alias("tok_md5"),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_prepare_corpus_stream_rejects_cross_doc_stages(spark):
    import pytest
    from pyspark.sql import functions as F

    from vinum_spark.operators.pipeline import (
        CorpusConfig,
        prepare_corpus_stream,
    )
    from vinum_spark.streaming.windows import stream_table

    s = stream_table(
        spark, "/root/testdata/sf0.001/documents.parquet"
    ).withColumn("ts", F.current_timestamp())
    for cfg in (
        CorpusConfig(boilerplate_width=4),
        CorpusConfig(mixture_weights={"a": 1.0}),
        CorpusConfig(
            decontaminate_against=spark.read.parquet(
                "/root/testdata/sf0.001/documents.parquet"
            )
        ),
    ):
        with pytest.raises(ValueError, match="batch refinement"):
            prepare_corpus_stream(s, cfg)


def test_prepare_corpus_batch_dedup_cols(spark):
    """CorpusConfig.dedup_cols must key the BATCH dedup stage too —
    raw-text key keeps case-distinct docs the fingerprint key folds."""
    from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus

    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "hello world"), (3, "hello world")],
        "doc_id long, text string",
    )
    by_fp = prepare_corpus(df, CorpusConfig(quality_filter=False, dedup=True))
    assert by_fp.count() == 1  # fingerprint lowercases -> all collapse
    by_raw = prepare_corpus(
        df,
        CorpusConfig(quality_filter=False, dedup=True, dedup_cols=("text",)),
    )
    assert sorted(r["doc_id"] for r in by_raw.collect()) == [1, 2]


def test_prepare_corpus_stream_with_chunking(spark):
    """chunk_max_len composes with the STREAMING pipeline (chunking is
    a posexplode projection — legal after watermarked dedup): the
    drained chunk rows equal the batch pipeline's on the same data."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.pipeline import (
        CorpusConfig,
        prepare_corpus,
        prepare_corpus_stream,
    )
    from vinum_spark.operators.text import learn_bpe_merges
    from vinum_spark.streaming.windows import (
        run_stream_to_memory,
        stream_table,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    batch = spark.read.parquet(path)
    merges = learn_bpe_merges(
        batch, n_merges=4, byte_level=True, token_pattern="[^ ]+"
    )
    cfg = CorpusConfig(
        quality_filter=True,
        dedup=True,
        tokenize_with=merges,
        tokenize_byte_level=True,
        tokenize_pattern="[^ ]+",
        chunk_max_len=16,
        chunk_stride=12,
        chunk_min_len=4,
    )
    stream = stream_table(spark, path).withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
    )
    out = prepare_corpus_stream(stream, cfg, watermark="365 days").select(
        "doc_id", "chunk_id", "token_ids"
    )
    run_stream_to_memory(out, "pcs_chunks", mode="append", state_partitions=4)
    got = {
        (r["doc_id"], r["chunk_id"]): r["token_ids"]
        for r in spark.table("pcs_chunks").collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"]): r["token_ids"]
        for r in prepare_corpus(batch, cfg).collect()
    }
    assert got == want and len(got) > 0


def test_pack_blocks_over_landed_stream_chunks_match_batch(spark):
    """The 'pack in the batch refinement pass' contract: block packing
    needs the shard-stream TOTAL order, so it cannot run inside the
    stream — but running pack_token_blocks over the LANDED stream
    chunks must equal running it over the batch pipeline's chunks,
    because the packing is a total function of (key, seed, block_size)
    and the chunk sets are equal (pinned above). This is the q104
    gate's composed second half: stream -> chunks land -> batch pack
    == batch -> chunks -> pack."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.pipeline import (
        CorpusConfig,
        prepare_corpus,
        prepare_corpus_stream,
    )
    from vinum_spark.operators.sampling import pack_token_blocks
    from vinum_spark.operators.text import learn_bpe_merges
    from vinum_spark.streaming.windows import (
        run_stream_to_memory,
        stream_table,
    )

    path = "/root/testdata/sf0.001/documents.parquet"
    batch = spark.read.parquet(path)
    merges = learn_bpe_merges(
        batch, n_merges=4, byte_level=True, token_pattern="[^ ]+"
    )
    cfg = CorpusConfig(
        quality_filter=True,
        dedup=True,
        tokenize_with=merges,
        tokenize_byte_level=True,
        tokenize_pattern="[^ ]+",
        chunk_max_len=16,
        chunk_stride=12,
        chunk_min_len=4,
    )
    stream = stream_table(spark, path).withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
    )
    out = prepare_corpus_stream(stream, cfg, watermark="365 days").select(
        "doc_id", "chunk_id", "token_ids"
    )
    run_stream_to_memory(out, "pcs_pack_src", mode="append", state_partitions=4)

    def blocks_of(chunks):
        # the deterministic pack key is (doc, chunk) — the md5 stream
        # order then depends only on values, never on arrival order
        keyed = chunks.withColumn(
            "__key",
            F.concat_ws(":", F.col("doc_id"), F.col("chunk_id")),
        )
        return {
            (r["shard"], r["block_id"]): r["token_ids"]
            for r in pack_token_blocks(
                keyed, block_size=32, key_col="__key", n_shards=4
            ).collect()
        }

    got = blocks_of(spark.table("pcs_pack_src"))
    want = blocks_of(
        prepare_corpus(batch, cfg).select("doc_id", "chunk_id", "token_ids")
    )
    assert got == want and len(got) > 0
