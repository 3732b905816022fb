"""Production-size tokenize anchor: ``bpe_tokenize`` (batch) and
``bpe_tokenize_map_side`` with a **32k-merge byte-level table** over a
**1M-type corpus** (VERDICT r13 item 5). Earlier tokenize anchors used
8-merge tables; a production table is 32k-64k and the per-word
rank-loop cost grows with merges-present-in-word, so the claim "the
Python stage is vocabulary-bounded" needed a measurement at the real
operating point.

Corpus: deterministic Zipf-ish synthetic built entirely executor-side
(no Date/random): word type i in 1..T is a 10-letter-alphabet mangling
of i (two digit->letter translations concatenated, ~8-15 chars — long
enough that 32k merges stay busy), with frequency max(1, T div i) —
total tokens ~= T*ln(T) (~14M at T=1M). Docs carry up to 1000 words;
frequency overflow replicates rows, so no document string exceeds ~16KB.

Measures, at T=1M (and a 2x-token variant at the SAME type count, the
direct vocabulary-boundedness check):
- fast-path training wall for 32k merges (driver-local indexed trainer
  over the collected dictionary — the production path);
- bpe_tokenize wall: rank loop over DISTINCT words only, corpus pays
  explode + word equi-join + ordered reassembly;
- bpe_tokenize_map_side wall: rank loop per executor with the Zipf
  word cache, zero shuffles.

Expected shape (recorded in BASELINE.md): doubling tokens at constant
types grows tokenize wall sub-2x and leaves the Python stage flat —
if wall scaled with merges x corpus instead, this anchor catches it.

Usage: python tools/scale_tokenize32k.py [--types N] [--merges K]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = "/tmp/tok32k"


def build_corpus(spark, types: int, rep: int) -> str:
    """Zipf-ish corpus with exactly ``types`` distinct words, each word
    appearing rep * max(1, types div i) times, packed into docs of
    <=1000 words."""
    from pyspark.sql import functions as F

    path = os.path.join(OUT_DIR, f"t{types}_r{rep}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    base = spark.range(1, types + 1).select(
        F.concat(
            F.translate(F.col("id").cast("string"), "0123456789", "abcdefghij"),
            F.translate(
                (F.col("id") * 7 + 3).cast("string"), "0123456789", "kmnopqrstu"
            ),
        ).alias("word"),
        (F.greatest(F.lit(1), F.lit(types) / F.col("id"))).cast("long").alias("freq"),
    )
    docs = (
        base.withColumn("freq", F.col("freq") * rep)
        .select(
            "word",
            F.explode(
                F.expr("sequence(0, CAST((freq - 1) DIV 1000 AS INT))")
            ).alias("chunk"),
            F.col("freq"),
        )
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.array_join(
                F.array_repeat(
                    F.col("word"),
                    F.least(
                        F.lit(1000),
                        (F.col("freq") - F.col("chunk") * 1000).cast("int"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
    )
    docs.repartition(32).write.mode("overwrite").parquet(path)
    return path


def timed(fn, n: int = 3):
    fn()  # warm-up
    runs, out = [], None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 2), out


def main() -> None:
    from pyspark.sql import functions as F

    from vinum_spark.operators import text as X
    from vinum_spark.session import get_spark

    types = 1_000_000
    merges = 32_000
    if "--types" in sys.argv:
        types = int(sys.argv[sys.argv.index("--types") + 1])
    if "--merges" in sys.argv:
        merges = int(sys.argv[sys.argv.index("--merges") + 1])

    spark = get_spark("tok32k")
    spark.sparkContext.setLogLevel("ERROR")
    kw = {"byte_level": True, "token_pattern": "[^ ]+"}

    base_path = build_corpus(spark, types, rep=1)
    corpus = spark.read.parquet(base_path)

    t0 = time.perf_counter()
    table = X.learn_bpe_merges(corpus, n_merges=merges, **kw)
    n_learned = table.count()  # fast path: learned at createDataFrame time
    train_wall = round(time.perf_counter() - t0, 1)
    table = table.cache()
    table.count()

    for rep in (1, 2):
        path = build_corpus(spark, types, rep)
        c = spark.read.parquet(path)
        n_tokens = c.select(
            F.sum(F.size(F.split("text", " ")))
        ).collect()[0][0]

        def batch():
            return (
                X.bpe_tokenize(c, table, id_col="doc_id", **kw)
                .agg(F.sum("n_tokens"))
                .collect()[0][0]
            )

        def map_side():
            return (
                X.bpe_tokenize_map_side(c, table, **kw)
                .agg(F.sum("n_tokens"))
                .collect()[0][0]
            )

        wall_b, out_b = timed(batch)
        wall_m, out_m = timed(map_side)
        assert out_b == out_m, (out_b, out_m)
        print(
            json.dumps(
                {
                    "types": types,
                    "merges": int(n_learned),
                    "train_wall_s": train_wall if rep == 1 else None,
                    "rep": rep,
                    "corpus_words": int(n_tokens),
                    "batch_wall_s": wall_b,
                    "map_side_wall_s": wall_m,
                    "bpe_tokens": int(out_b),
                    "batch_tokens_per_s": int(out_b / wall_b),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
