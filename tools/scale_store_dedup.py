"""Per-micro-batch cost vs STORE SIZE for streaming dedup against a
persistent fingerprint store — the measurement behind the bucketed
layout (io/bucketing, run_stream_dedup_against_store store_buckets):

A micro-batch's work is (read store -> anti-join -> land survivors ->
append fingerprints). With a PLAIN parquet store the anti-join
re-shuffles the whole store every batch — O(store) per batch. With the
BUCKETED store the store-side exchange is elided (plan-pinned in
tests/test_plans.py) and only the batch shuffles into the bucket
layout — O(batch). This tool holds the batch FIXED (100k docs, half
already stored, half fresh) and grows the store 1x/10x/100x
(100k/1M/10M fingerprints), timing one full micro-batch body per
(layout, size): the bucketed per-batch wall should stay ~flat while
the plain wall grows with the store.

Since round 16 the bucketed store is base+delta: the seed is COMPACTED
into an immutable base (one fingerprint-SORTED file per bucket) before
measuring, so the merge join reads the base in file order — no
store-side SORT either (plan-pinned). The store side still pays a
per-batch SCAN (unavoidable: membership needs the data); what the
layout removes is the store-side EXCHANGE and the O(store log store)
per-batch sort — the costs that dominate at a 2 TB store on a real
cluster. On local[32] the shuffle is memory-speed, so treat the
measured gap as a lower bound on the cluster gap.

Usage: python tools/scale_store_dedup.py [--quick]   (--quick: 1x/10x)
Writes under /tmp/storescale/ and prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = "/tmp/storescale"
BATCH = 100_000
BUCKETS = 32


def texts(spark, lo: int, hi: int):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("document body "), F.md5(F.col("id").cast("string"))).alias(
                "text"
            ),
        )
    )


def main() -> None:
    from pyspark.sql import functions as F

    from vinum_spark.io.bucketing import (
        append_fingerprints,
        compact_fingerprint_store,
        ensure_fingerprint_store,
        store_delta_frame,
    )
    from vinum_spark.operators.dedup import dedup_against_store
    from vinum_spark.operators.text import with_fingerprint
    from vinum_spark.session import get_spark

    sizes = (
        (100_000, 1_000_000)
        if "--quick" in sys.argv[1:]
        else (100_000, 1_000_000, 10_000_000)
    )
    spark = get_spark("storescale")
    spark.sparkContext.setLogLevel("ERROR")
    # host-window stamp (the bench.py calibration discipline): a run
    # recorded in a contended window carries the evidence with it —
    # round-16 measured the SAME code reading 1.17 s and 12.0 s at the
    # 100x point purely across windows (cal 2.1 vs 3.1)
    from bench import calibrate_host

    # unrecorded warmup: the first anti-join of a session pays JIT +
    # codegen + shuffle-service spin-up that would otherwise land
    # entirely on the first recorded row (observed +2.5 s on it)
    w = texts(spark, 0, 10_000)
    dedup_against_store(
        w, with_fingerprint(w, "text").select("fingerprint")
    ).write.format("noop").mode("overwrite").save()

    for size in sizes:
        # the batch: half its texts are already in the store (ids
        # [size-B/2, size)), half fresh — the steady-state mix
        batch = texts(spark, size - BATCH // 2, size + BATCH // 2)
        seeds = with_fingerprint(texts(spark, 0, size), "text").select(
            "fingerprint"
        )
        for layout in ("plain", "bucketed"):
            root = os.path.join(OUT_DIR, f"{layout}_{size}")
            shutil.rmtree(root, ignore_errors=True)
            out_path = os.path.join(OUT_DIR, f"out_{layout}_{size}")
            shutil.rmtree(out_path, ignore_errors=True)
            if layout == "bucketed":
                tbl = ensure_fingerprint_store(spark, root, BUCKETS)
                append_fingerprints(seeds, root, BUCKETS)
                # the steady-state shape: the backfill sits in the
                # COMPACTED base (one sorted file per bucket -> the
                # merge join needs no store-side sort), delta empty.
                # keep_grace=False = the single-reader mode this
                # single-process anchor is; the default grace mode
                # would leave the seed lingering in the delta for one
                # cycle and measure a base+full-delta join instead
                compact_fingerprint_store(
                    spark, root, BUCKETS, keep_grace=False
                )
            else:
                seeds.write.parquet(root)

            # one micro-batch body, exactly run_stream_dedup_against_
            # store's process(): read store (base + delta), anti-join,
            # land survivors, append fingerprints
            t0 = time.perf_counter()
            if layout == "bucketed":
                store = spark.table(tbl).select("fingerprint")
                delta = store_delta_frame(spark, root)
                extra = [delta] if delta is not None else []
            else:
                store = spark.read.parquet(root).select("fingerprint")
                extra = []
            surv = dedup_against_store(batch, store, extra_stores=extra).persist()
            surv.write.mode("append").parquet(out_path)
            if layout == "bucketed":
                append_fingerprints(surv, root, BUCKETS)
            else:
                surv.select("fingerprint").write.mode("append").parquet(root)
            surv.unpersist()
            wall = time.perf_counter() - t0
            # count from the LANDED output, never from `surv`: the
            # store append triggers Spark's recache-by-path on the
            # store, which RECOMPUTES the cached plan against the
            # now-mutated store (every batch fingerprint present ->
            # zero survivors). The production flow is ordered the same
            # way and never reads the frame after the append.
            n = spark.read.parquet(out_path).count()
            print(
                json.dumps(
                    {
                        "store_fingerprints": size,
                        "layout": layout,
                        "batch_docs": BATCH,
                        "survivors": int(n),
                        "batch_wall_s": round(wall, 2),
                        "cal_s": calibrate_host(),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
