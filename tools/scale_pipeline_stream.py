"""Streaming prepare_corpus THROUGHPUT anchor — the ingestion-rate
counterpart to the q98/q99 correctness gates: how many documents/sec
the full streaming pipeline (quality rules -> fingerprint ->
dropDuplicatesWithinWatermark -> map-side byte-BPE tokenize with
model-ready token_ids) sustains through REAL micro-batches.

Corpus: M salted copies of sf0.1's 5,000 documents (the scale_docs.py
recipe — copy k rewrites ~8% of words, so copies stay mostly distinct
and the dedup state holds ~all fingerprints), written as ``2*M``
parquet files and streamed with ``maxFilesPerTrigger=2`` so the M=10
run executes ~10 micro-batches and M=100 executes ~100 — per-batch
state commits included in the wall, exactly the production regime.
Event time advances with doc id (1 s/doc, copies tiled densely); the
watermark is sized to cover the WHOLE synthetic span because
FileStreamSource orders files by modification time, which is tied for
files written by one job — batches arrive in arbitrary event-time
order, and any smaller watermark silently drops whole batches as late
(observed: 73% of docs lost at a 1-hour watermark). Dedup state
therefore holds every fingerprint (~25 MB at M=100 — exactly what a
production dedup-within-retention holds); state EVICTION under an
advancing watermark is proven separately by q53 and
scale_streaming.py's 100-batch runs.

The drained sink keeps only (fingerprint, n_tokens) — the token_ids
are computed (the UDF runs) but not retained, so the measurement is
pipeline cost, not memory-sink cost.

``--blocks`` measures the FULL docs->blocks training-prep chain
instead: the streaming pipeline additionally chunks each document into
512-id context windows (chunk_max_len=512, stride=512 — a pure
projection, still inside the stream) and lands (fp, chunk_id,
token_ids) as a parquet sink (the production shape — a memory sink
retaining every id array would measure driver memory, not the
pipeline); then the batch refinement pass packs the landed chunks into
contiguous 512-id blocks (pack_token_blocks, noop-written so the
number is compute, not sink). Both walls are reported — the stream
drain and the pack pass — plus end-to-end docs/s and tokens/s over
their sum.

Usage: python tools/scale_pipeline_stream.py [--quick] [--rocksdb]
                                             [--blocks]
Writes corpora under /tmp/pcstream/ and prints one JSON line per M.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1/documents.parquet"
OUT_DIR = "/tmp/pcstream"


def build_corpus(spark, m: int) -> str:
    from pyspark.sql import functions as F

    path = os.path.join(OUT_DIR, f"m{m}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    base = spark.read.parquet(BASE).select("doc_id", "text")
    copies = spark.range(m).withColumnRenamed("id", "copy")
    salted = (
        base.crossJoin(copies)
        .withColumn(
            "text",
            F.when(F.col("copy") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.when(
                            F.pmod(F.xxhash64(w, F.col("copy")), F.lit(12))
                            == 0,
                            F.concat(
                                w, F.lit("~"), F.col("copy").cast("string")
                            ),
                        ).otherwise(w),
                    ),
                    " ",
                )
            ),
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * 10_000_000)
        .drop("copy")
    )
    # 2*M files ordered by doc id -> ~M micro-batches at
    # maxFilesPerTrigger=2, each advancing the watermark
    salted.repartitionByRange(2 * m, "doc_id").sortWithinPartitions(
        "doc_id"
    ).write.mode("overwrite").parquet(path)
    return path


def _attribute(progress_list) -> dict:
    """Per-stage wall attribution summed over a drained stream's
    recentProgress: where each micro-batch's triggerExecution went
    (addBatch = plan + run + SINK write; walCommit/commitOffsets =
    checkpoint log writes, the pair that grows with the sink metadata
    log; state commit/update from the stateOperators metrics). All
    seconds, plus batch count and final state rows — the decomposition
    behind the decade-scaling claim."""
    keys = (
        "addBatch",
        "walCommit",
        "commitOffsets",
        "getBatch",
        "latestOffset",
        "queryPlanning",
        "triggerExecution",
    )
    sums = {k: 0.0 for k in keys}
    state_commit = state_update = 0.0
    state_rows = 0
    n = 0
    for p in progress_list:
        d = p.get("durationMs") or {}
        if not d:
            continue
        n += 1
        for k in keys:
            sums[k] += float(d.get(k, 0)) / 1000.0
        for so in p.get("stateOperators") or []:
            state_commit += float(so.get("commitTimeMs", 0)) / 1000.0
            state_update += float(so.get("allUpdatesTimeMs", 0)) / 1000.0
            state_rows = max(state_rows, int(so.get("numRowsTotal", 0)))
    out = {f"{k}_s": round(v, 1) for k, v in sums.items()}
    out["state_commit_s"] = round(state_commit, 1)
    out["state_update_s"] = round(state_update, 1)
    out["state_rows"] = state_rows
    out["batches"] = n
    # the flat-per-batch claim, directly: if late batches cost what
    # early ones did, nothing (state size, metadata log, sink) grows
    # per-batch work over the run
    per_batch = [
        float((p.get("durationMs") or {}).get("triggerExecution", 0)) / 1000.0
        for p in progress_list
        if p.get("durationMs")
    ]
    k = min(10, max(1, len(per_batch) // 2))
    out["first_batches_avg_s"] = round(sum(per_batch[:k]) / k, 2)
    out["last_batches_avg_s"] = round(sum(per_batch[-k:]) / k, 2)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from vinum_spark.operators.pipeline import (
        CorpusConfig,
        prepare_corpus_stream,
    )
    from vinum_spark.operators.text import learn_bpe_merges
    from vinum_spark.session import get_spark
    from vinum_spark.streaming.windows import (
        run_stream_to_memory,
        stream_table,
    )

    ms = (1, 10) if "--quick" in sys.argv[1:] else (1, 10, 100)
    state_store = "rocksdb" if "--rocksdb" in sys.argv[1:] else None
    blocks = "--blocks" in sys.argv[1:]

    spark = get_spark("pcstream")
    spark.sparkContext.setLogLevel("ERROR")
    # host-window stamp (the bench.py calibration discipline) — the
    # round-15 "super-linear decade" was entirely a window artifact;
    # every record now carries its own evidence
    from bench import calibrate_host
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # keep every micro-batch's progress for the attribution pass
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "256")

    # one production-shaped table, trained once on the base corpus
    merges = learn_bpe_merges(
        spark.read.parquet(BASE),
        n_merges=1024,
        byte_level=True,
        token_pattern="[^ ]+",
    ).cache()
    merges.count()
    cfg = CorpusConfig(
        quality_filter=True,
        dedup=True,
        dedup_cols=("fp",),
        tokenize_with=merges,
        tokenize_byte_level=True,
        tokenize_pattern="[^ ]+",
        tokenize_emit_ids=True,
        chunk_max_len=512 if blocks else None,
        chunk_stride=512 if blocks else None,
    )

    for m in ms:
        path = build_corpus(spark, m)
        # doc_id -> event time at 1 s/doc within a copy (copies are
        # 10M ids apart; pmod folds them back so time stays dense)
        stream = (
            stream_table(spark, path, max_files_per_trigger=2)
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.lit(1_700_000_000)
                    + F.pmod(F.col("doc_id"), F.lit(10_000_000))
                    + (F.col("doc_id") / 10_000_000).cast("long") * 5_000
                ),
            )
            .withColumn("fp", F.md5("text"))
        )
        piped = prepare_corpus_stream(
            stream, cfg, ts_col="ts", watermark="30 days"
        )
        if blocks:
            import shutil

            from vinum_spark.operators.sampling import pack_token_blocks
            from vinum_spark.streaming.windows import (
                _drain,
                _start_with_state_partitions,
            )

            land = os.path.join(OUT_DIR, f"chunks_m{m}")
            ckpt = os.path.join(OUT_DIR, f"ckpt_m{m}")
            shutil.rmtree(land, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)
            out = piped.select("fp", "chunk_id", "token_ids", "n_tokens")
            t0 = time.perf_counter()
            writer = (
                out.writeStream.format("parquet")
                .option("path", land)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
            )
            if state_store == "rocksdb":
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass",
                    "org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider",
                )
            q = _start_with_state_partitions(spark, writer, 8)
            _drain(q, f"pcs_blocks_m{m}", 1800.0)
            wall_stream = time.perf_counter() - t0
            attr = _attribute(q.recentProgress)
            landed = spark.read.parquet(land)
            t1 = time.perf_counter()
            keyed = landed.withColumn(
                "__key", F.concat_ws(":", F.col("fp"), F.col("chunk_id"))
            )
            pack_token_blocks(
                keyed, block_size=512, key_col="__key", n_shards=32
            ).write.format("noop").mode("overwrite").save()
            wall_pack = time.perf_counter() - t1
            n_chunks, n_tokens = (
                landed.count(),
                landed.agg(F.sum("n_tokens")).collect()[0][0],
            )
            wall = wall_stream + wall_pack
            print(
                json.dumps(
                    {
                        "m": m,
                        "input_docs": 5000 * m,
                        "chunks": int(n_chunks),
                        "tokens": int(n_tokens),
                        "wall_stream_s": round(wall_stream, 1),
                        "wall_pack_s": round(wall_pack, 1),
                        "wall_s": round(wall, 1),
                        "docs_per_s": int(5000 * m / wall),
                        "tokens_per_s": int(n_tokens / wall),
                        "state_store": state_store or "hdfs-default",
                        "cal_s": calibrate_host(),
                        **attr,
                    }
                ),
                flush=True,
            )
            continue
        out = piped.select("fp", "n_tokens")
        t0 = time.perf_counter()
        run_stream_to_memory(
            out,
            f"pcs_m{m}",
            mode="append",
            state_partitions=8,
            state_store=state_store,
        )
        wall = time.perf_counter() - t0
        res = spark.table(f"pcs_m{m}")
        n_docs, n_tokens = res.count(), res.agg(
            F.sum("n_tokens")
        ).collect()[0][0]
        print(
            json.dumps(
                {
                    "m": m,
                    "input_docs": 5000 * m,
                    "survivors": int(n_docs),
                    "tokens": int(n_tokens),
                    "wall_s": round(wall, 1),
                    "docs_per_s": int(5000 * m / wall),
                    "state_store": state_store or "hdfs-default",
                    "cal_s": calibrate_host(),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
