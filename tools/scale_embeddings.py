"""10x/100x embedding-corpus scale measurement for the similarity family
(the embeddings analogue of BASELINE.md's round-8 documents run).

No sf1 embeddings exist, so the corpus is M copies of sf0.1's 2000
base vectors: copy 0 verbatim, copy k>0 perturbed with deterministic
N(0, (0.15*rms)^2) noise per component (numpy seed k) — cross-copy
cosine concentrates near 1/(1+0.15^2) ~ 0.978, so every base
contributes C(M,2) planted near-dup pairs above the 0.9 verify
threshold: a HARSHER pair-growth regime than a natural corpus (same
rationale as the round-8 documents salting).

Measures, at M=10 (20k rows) and M=100 (200k rows), median-of-3 wall
to a noop sink on one warm session:

- lsh_candidate_pairs(126 planes over two signature columns, 14-bit
  bands) + cosine_verify(0.9):
  the candidates-bounded near-dup path; also reports found-pair count
  and recall vs the numpy-exact planted-pair truth (all C(M,2) pairs
  per base whose true cosine >= 0.9, computed with per-base Gram
  matrices — cross-base true pairs are counted exactly at M=10 via a
  blocked full Gram and shown to be zero).
- knn_join: 40 fixed queries vs the full corpus (block-grid exact) —
  wall should scale ~linearly with corpus rows for a fixed query set.
- ivfpq_topk(16 cells, nprobe 4, m=16): single-query ANN — the ADC
  scan reads nprobe/n_cells of the corpus' code column only.

Band-width note (100 TB design): band_bits must grow with
log2(corpus/bucket_target), and holding recall while bands get more
selective needs MORE bands — i.e. total planes beyond one long's 63
bits. The first attempt at M=100 used 63 planes / 9-bit bands: every
512-way band bucket held ~390 random rows (~270M candidate pairs,
all random collisions) and the run OOM'd — that failure drove the
multi-signature support in lsh_candidate_pairs. The settings here
(126 planes = two signature columns, 9 bands of 14 bits) keep buckets
~12 rows at 200k corpus with planted recall ~1-(1-0.933^14)^9 ~ 0.99
at cos 0.978.

- semantic_dedup (round 17, run with ``--only semantic``): the
  SemDeDup chain over the same corpus — the perturbed copies
  (cos ~0.978 > the 0.95 threshold) are planted duplicate GROUPS, so
  the anchor reports how many rows were dropped vs the (M-1)*n_base
  ideal. n_clusters follows the paper's √n guidance (128 at M=10,
  512 at M=100) — within-cluster pair work is Σ|cluster|², so the
  knob trades recall (copies of one base straddling more cluster
  boundaries) against bounded pair enumeration; both effects are the
  measurement.

Usage:  python tools/scale_embeddings.py [--quick] [--only stage,..]
  --quick: M=2 and M=10 only (CI-sized smoke; full run is M=10/100).
  --only:  comma-separated subset of neardup,knn,ivfpq,semantic
           (default: neardup,knn,ivfpq — the pre-r17 behavior).
Writes corpora under /tmp/embscale/ and prints one JSON line per M.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1/embeddings.parquet"
OUT_DIR = "/tmp/embscale"
SIGMA_REL = 0.15
THRESHOLD = 0.9
#: semantic_dedup's duplicate threshold (the q110 gate value) — the
#: perturbed copies' ~0.978 cosine clears it
THRESHOLD_SEM = 0.95


def build_corpus(m: int) -> tuple[str, np.ndarray, np.ndarray]:
    """Write the M-copy corpus parquet; return (path, ids, float64 mat)."""
    import pyarrow.parquet as pq

    base = pq.read_table(BASE).to_pandas()
    V = np.stack(base["embedding"].to_numpy()).astype("float64")
    rms = float(np.sqrt((V**2).mean()))
    ids, mats = [], []
    for k in range(m):
        Vk = V.copy()
        if k:
            rng = np.random.default_rng(k)
            Vk += rng.normal(0.0, SIGMA_REL * rms, V.shape)
        ids.append(np.arange(len(V), dtype="int64") + k * 1_000_000)
        mats.append(Vk)
    all_ids = np.concatenate(ids)
    M = np.vstack(mats)
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"m{m}.parquet")
    pd.DataFrame(
        {"vec_id": all_ids, "embedding": [r.astype("float32") for r in M]}
    ).to_parquet(path, index=False)
    return path, all_ids, M


def planted_true_pairs(ids: np.ndarray, M: np.ndarray, n_base: int) -> int:
    """Exact count of SAME-BASE pairs with cosine >= THRESHOLD via one
    (m x m) Gram per base vector — the planted truth."""
    m = len(ids) // n_base
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    count = 0
    for i in range(n_base):
        rows = Mn[i::n_base] if False else Mn[[i + k * n_base for k in range(m)]]
        g = rows @ rows.T
        iu = np.triu_indices(m, 1)
        count += int((g[iu] >= THRESHOLD).sum())
    return count


def cross_base_true_pairs_blocked(M: np.ndarray, n_base: int) -> int:
    """Exact count of DIFFERENT-BASE pairs >= THRESHOLD (blocked full
    Gram minus the planted diagonal blocks). O(N^2 d) — only call at
    small M."""
    Mn = (M / np.linalg.norm(M, axis=1, keepdims=True)).astype("float32")
    n = len(Mn)
    m = n // n_base
    total = 0
    step = 2000
    for s in range(0, n, step):
        g = Mn[s : s + step] @ Mn.T
        ii, jj = np.nonzero(g >= THRESHOLD)
        ii = ii + s
        keep = jj > ii  # upper triangle only
        ii, jj = ii[keep], jj[keep]
        same_base = (ii % n_base) == (jj % n_base)
        total += int((~same_base).sum())
    return total


def timed(fn, n=3):
    fn()  # warm-up
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3)


def main() -> None:
    args = sys.argv[1:]
    quick = "--quick" in args
    ms = (2, 10) if quick else (10, 100)
    all_stages = ("neardup", "knn", "ivfpq", "semantic")
    if "--only" in args:
        try:
            only = set(args[args.index("--only") + 1].split(","))
        except IndexError:
            raise SystemExit("--only needs a comma-separated stage list")
        unknown = only - set(all_stages)
        if unknown:
            raise SystemExit(f"--only: unknown stages {sorted(unknown)}")
    else:
        only = {"neardup", "knn", "ivfpq"}  # the pre-r17 default set

    from pyspark.sql import functions as F

    from vinum_spark.session import get_spark
    import vinum_spark.operators.similarity as S

    spark = get_spark("embscale")
    spark.sparkContext.setLogLevel("ERROR")

    for m in ms:
        path, ids, M = build_corpus(m)
        n_base = len(ids) // m
        emb = spark.read.parquet(path)

        rec = {"m": m, "rows": int(len(ids))}

        if "neardup" in only:
            def neardup():
                cands = S.lsh_candidate_pairs(
                    emb, dim=64, n_planes=126, band_bits=14
                )
                return S.cosine_verify(emb, cands, threshold=THRESHOLD, dim=64)

            rec["neardup_wall_s"] = timed(
                lambda: neardup().write.format("noop").mode("overwrite").save()
            )
            found = neardup().count()
            planted = planted_true_pairs(ids, M, n_base)
            cross = (
                cross_base_true_pairs_blocked(M, n_base) if m <= 10 else None
            )
            rec["neardup_pairs_found"] = int(found)
            rec["planted_true_pairs"] = int(planted)
            rec["cross_base_true_pairs"] = cross
            rec["recall_vs_planted"] = (
                round(found / planted, 4) if planted else None
            )

        if "knn" in only:
            queries = emb.filter(F.col("vec_id") < 40)
            rec["knn40_wall_s"] = timed(
                lambda: S.knn_join(
                    queries, emb.filter(F.col("vec_id") >= 40), k=5
                )
                .write.format("noop")
                .mode("overwrite")
                .save()
            )

        if "ivfpq" in only:
            qv = [float(x) for x in M[0]]
            books = S.train_pq_codebooks(emb, 64, m=16, n_codes=64)
            rec["ivfpq_wall_s"] = timed(
                lambda: S.ivfpq_topk(
                    emb, qv, k=10, n_cells=16, nprobe=4, m=16, n_codes=64,
                    rerank=100, codebooks=books,
                )
                .write.format("noop")
                .mode("overwrite")
                .save()
            )

        if "semantic" in only:
            # DEFAULT auto knob (round 18): n_clusters=None derives
            # ~sqrt(corpus) via semantic_n_clusters — the anchor
            # measures the path a knob-less user gets. Within-cluster
            # pair work is Σ|cluster|², recall decays as one base's
            # copies straddle more boundaries — both effects ARE the
            # measurement
            n_clusters = S.semantic_n_clusters(len(ids))
            sem = S.semantic_dedup(
                emb, dim=64, threshold=THRESHOLD_SEM
            )
            rec["semantic_wall_s"] = timed(
                lambda: S.semantic_dedup(
                    emb, dim=64, threshold=THRESHOLD_SEM
                )
                .write.format("noop")
                .mode("overwrite")
                .save(),
                n=1,
            )
            dropped = sem.filter("NOT kept").count()
            ideal = (m - 1) * n_base
            rec["semantic_n_clusters"] = n_clusters
            rec["semantic_dropped"] = int(dropped)
            rec["semantic_ideal_dropped"] = int(ideal)
            rec["semantic_dedup_recall"] = (
                round(dropped / ideal, 4) if ideal else None
            )

        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
