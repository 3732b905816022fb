"""10x/100x documents-corpus scale measurement for the pair-producing
text operators (the committed companion to BASELINE.md's round-8 ad-hoc
sf1 run, extended to 100x per VERDICT r9 item 5).

No sf1+ documents exist, so the corpus is M copies of sf0.1's 5,000
base docs built INSIDE Spark (a 500k-doc frame never touches the
driver): copy 0 verbatim, copy k>0 with a deterministic salt on ~8% of
words (pmod(xxhash64(word, copy), 12) == 0 rewrites the word to
``word~k``) — copies stay ~92% shingle-identical, the same
rampant-cross-copy-collision regime as the round-8 run.

Measures, at M=10 (50k docs, the round-8 point) and M=100 (500k docs):

- q54-shaped winnowing_shared_pairs (k=16, window=4, max_doc_freq=10,
  min_shared=5): the round-8 10x point showed 123x output pairs in
  7.7x wall (per-pair cost falling). At 100x the df<=10 rarity cap
  becomes the star: fingerprints shared across ~100 near-identical
  copies EXCEED the cap and drop, so candidate buckets stay bounded at
  10 rows regardless of M — pair growth is capped by design, and wall
  should fall back to ~linear in corpus size. A super-linear wall here
  would mean some stage still scales with collisions, not candidates.
- q68-shaped contaminated_docs (n=4) against a FIXED eval set (the
  base corpus' doc_id%10==0 slice, 500 docs — benchmarks don't grow
  with the training corpus, and a fixed eval keeps the broadcast side
  constant-size by construction, the operator's 100 TB contract).
  Hits and wall should both scale ~M.
- q108-shaped duplicated_ngram_spans / remove_duplicated_spans (n=8,
  min_count=2): the salted-copy corpus is the designed WORST CASE for
  the operator's one corpus-sized shuffle — ~92% of each copy's
  windows are unsalted and therefore cross-copy identical, so at
  M=100 every such window hash carries ~100 rows into one partition
  of the count-over-Window.partitionBy(__h) Exchange (dup-hash skew,
  the untested axis the r16 verdict named). Wall should scale ~M
  (the Exchange carries the exploded window set ≈ corpus tokens); a
  super-linear wall means the skewed __h partitions dominate and the
  checkpoint+groupBy+semi-join alternative (distinct-hash-sized,
  partial-aggregated shuffle at the cost of a second explode) should
  be re-evaluated.

Usage:  python tools/scale_docs.py [--quick] [--only stage,stage]
  --quick: M=2 and M=10 only (smoke; the full run is M=10/100).
  --only:  comma-separated subset of winnowing,decontamination,bpe,
           tokenize,exactsubstr,dsir (default: all).
Writes corpora under /tmp/docscale/ and prints one JSON line per M.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1/documents.parquet"
OUT_DIR = "/tmp/docscale"


def build_corpus(spark, m: int) -> str:
    """M salted copies, built and written entirely executor-side."""
    from pyspark.sql import functions as F

    path = os.path.join(OUT_DIR, f"m{m}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    base = spark.read.parquet(BASE)
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
    salted.repartition(max(4, m // 2)).write.mode("overwrite").parquet(path)
    return path


def timed(fn, n=3, warm=True):
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

    from vinum_spark.operators import dedup as D
    from vinum_spark.operators import text as X
    from vinum_spark.session import get_spark

    spark = get_spark("docscale")
    spark.sparkContext.setLogLevel("ERROR")
    args = sys.argv[1:]
    ms = (2, 10) if "--quick" in args else (10, 100)
    # parse/validate --only BEFORE any corpus build: a typo'd stage or
    # a missing value must be a usage error, not an IndexError after
    # minutes of executor work
    all_stages = (
        "winnowing", "decontamination", "bpe", "tokenize", "exactsubstr",
        "dsir",
    )
    if "--only" in args:
        try:
            only = set(args[args.index("--only") + 1].split(","))
        except IndexError:
            raise SystemExit("--only needs a comma-separated stage list")
    else:
        only = set(all_stages)
    unknown = only - set(all_stages)
    if unknown:
        raise SystemExit(f"--only: unknown stages {sorted(unknown)}")

    # fixed eval set: the BASE corpus' doc_id%10==0 slice (500 docs)
    eval_df = (
        spark.read.parquet(BASE).filter(F.col("doc_id") % 10 == 0).cache()
    )
    eval_df.count()

    for m in ms:
        path = build_corpus(spark, m)
        corpus = spark.read.parquet(path)

        def winnow():
            return X.winnowing_shared_pairs(
                corpus, col="text", id_col="doc_id", k=16, window=4,
                max_doc_freq=10, min_shared=5,
            ).count()

        def decon():
            # corpus slice mirrors q68: everything outside the eval ids
            c = corpus.filter(F.col("doc_id") % 10_000_000 % 10 != 0)
            return D.contaminated_docs(c, eval_df, n=4).count()

        def bpe():
            # round-12: BPE training — one corpus-sized word shuffle,
            # then 8 vocab-table iterations; the [a-z]+ alphabet
            # collapses the '~k' salts back to base words, so vocab
            # stays ~constant while the corpus scan scales with M.
            # collect_cap=0 pins the DISTRIBUTED loop (the r12 row's
            # semantics) — the default fast path would collect the
            # vocab and skip the per-merge Spark jobs entirely.
            return X.learn_bpe_merges(
                corpus, n_merges=8, collect_cap=0
            ).count()

        def tokenize():
            # round-13: full-corpus tokenization with a fast-path-
            # trained table — the end-to-end q89/q91 shape. Python
            # rank-loop cost scales with DISTINCT words (~constant
            # here); the corpus pays explode + word equi-join +
            # ordered reassembly, so wall should scale ~M.
            merges = X.learn_bpe_merges(corpus, n_merges=8)
            toks = X.bpe_tokenize(corpus, merges, id_col="doc_id")
            return toks.agg(F.sum("n_tokens")).collect()[0][0]

        def exactsubstr():
            # round-17: the ExactSubstr pipeline — span detection plus
            # removal (the removal re-runs the span op and adds the
            # doc-keyed aggregate-back join). Returns (spans, tokens
            # removed) so the collision regime is visible in the record.
            spans = D.duplicated_ngram_spans(corpus, n=8).count()
            removed = (
                D.remove_duplicated_spans(corpus, n=8)
                .agg(F.sum("dup_tokens"))
                .collect()[0][0]
            )
            return (int(spans), int(removed))

        n = 3 if m <= 10 else 1
        rec = {"m": m, "docs": 5000 * m}
        if "winnowing" in only:
            wall_w, pairs = timed(winnow, n=n, warm=m <= 10)
            rec["winnowing_wall_s"] = wall_w
            rec["winnowing_pairs"] = int(pairs)
        if "decontamination" in only:
            wall_d, hits = timed(decon, n=n, warm=m <= 10)
            rec["decontamination_wall_s"] = wall_d
            rec["contaminated_docs"] = int(hits)
        if "bpe" in only:
            wall_b, n_merges = timed(bpe, n=n, warm=m <= 10)
            rec["bpe_wall_s"] = wall_b
            rec["bpe_merges"] = int(n_merges)
        if "tokenize" in only:
            wall_t, n_tokens = timed(tokenize, n=n, warm=m <= 10)
            rec["tokenize_wall_s"] = wall_t
            rec["tokens"] = int(n_tokens)
        if "dsir" in only:
            # round-17: DSIR selection toward the FIXED eval slice as
            # the target domain — one raw-corpus projection + broadcast
            # 1024-row ratio join + partial-agg weight sum + top-k, so
            # wall should scale ~M; the target side is constant-size by
            # construction (the operator's 100 TB contract, same as
            # decontamination's)
            from vinum_spark.operators.sampling import dsir_select

            def dsir():
                c = corpus.filter(F.col("doc_id") % 10_000_000 % 10 != 0)
                return dsir_select(c, eval_df, k=1000).count()

            wall_ds, n_sel = timed(dsir, n=n, warm=m <= 10)
            rec_extra_dsir = (wall_ds, int(n_sel))
        else:
            rec_extra_dsir = None

        if "exactsubstr" in only:
            wall_e, (n_spans, n_removed) = timed(
                exactsubstr, n=n, warm=m <= 10
            )
            rec["exactsubstr_wall_s"] = wall_e
            rec["dup_spans"] = n_spans
            rec["dup_tokens_removed"] = n_removed
        if rec_extra_dsir is not None:
            rec["dsir_wall_s"] = rec_extra_dsir[0]
            rec["dsir_selected"] = rec_extra_dsir[1]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
