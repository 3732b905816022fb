"""Unit tests for the LLM-pipeline operators over tiny synthetic data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "src0"),
        (1, "the quick brown fox jumps over the lazy dog", "src0"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat", "src1"),  # near dup
        (3, "completely different content about spark engines", "src1"),
        (4, "  The QUICK brown   fox jumps over the lazy dog  ", "src2"),  # norm dup
        (5, "", "src2"),  # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dedup_exact(docs):
    from vinum_spark.operators import dedup_exact

    kept = dedup_exact(docs).select("doc_id").toPandas()["doc_id"].tolist()
    # 1 (exact dup) and 4 (whitespace/case-normalized dup) are removed
    assert sorted(kept) == [0, 2, 3, 5]


def test_minhash_lsh_dedup(docs):
    from vinum_spark.operators import minhash_lsh_dedup

    kept = (
        minhash_lsh_dedup(docs, n_hashes=32, bands=16)
        .select("doc_id")
        .toPandas()["doc_id"]
        .tolist()
    )
    assert 0 in kept and 3 in kept
    assert 1 not in kept  # identical signature as 0


def test_ngram_jaccard_pairs(docs):
    from vinum_spark.operators import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5).toPandas()
    pair_set = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert (0, 1) in pair_set  # identical docs
    jac_01 = float(pairs[(pairs.id_a == 0) & (pairs.id_b == 1)].jaccard.iloc[0])
    assert jac_01 == 1.0


def test_simhash_near_duplicates_close(docs):
    from vinum_spark.operators import simhash

    h = {
        int(r["doc_id"]): int(r["simhash"])
        for r in simhash(docs).select("doc_id", "simhash").collect()
        if r["simhash"] is not None
    }
    assert h[0] == h[1]  # identical text → identical simhash
    ham_near = bin(h[0] ^ h[2]).count("1")
    ham_far = bin(h[0] ^ h[3]).count("1")
    assert ham_near < ham_far  # near-dup is closer than unrelated doc


def test_text_stats(docs):
    from vinum_spark.operators import with_token_count, with_text_stats

    out = with_text_stats(docs).filter(F.col("doc_id") == 0).collect()[0]
    assert out["n_tokens"] == 9
    assert out["n_words"] == 9
    assert out["punct_ratio"] == 0.0
    empty = with_token_count(docs).filter(F.col("doc_id") == 5).collect()[0]
    assert empty["n_tokens"] == 0


def test_fingerprint_normalizes(docs):
    from vinum_spark.operators import with_fingerprint

    fp = {
        int(r["doc_id"]): r["fingerprint"]
        for r in with_fingerprint(docs).collect()
    }
    assert fp[0] == fp[1] == fp[4]
    assert fp[0] != fp[2]


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    base = rng.standard_normal(8)
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base + 0.01 * rng.standard_normal(8)]),  # near 0
        (2, [float(x) for x in -base]),  # opposite
        (3, [float(x) for x in rng.standard_normal(8)]),
        (4, [float(x) for x in rng.standard_normal(8)]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk(vectors):
    from vinum_spark.operators import cosine_topk

    q = vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    top = cosine_topk(vectors, q, k=2).toPandas()
    assert top.vec_id.tolist()[:2] == [0, 1]
    assert top.cosine.iloc[0] == pytest.approx(1.0)


def test_ivf_recovers_close_neighbor(vectors):
    from vinum_spark.operators import ivf_index, ivf_topk

    q = vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    top = ivf_topk(vectors, q, k=2, n_cells=4, nprobe=1).toPandas()
    assert 0 in top.vec_id.tolist()  # query's own cell is probed first
    cells = ivf_index(vectors, dim=8, n_cells=4).toPandas()
    assert cells.ivf_cell.between(0, 3).all()
    # identical vectors land in the same cell: 0 and its 0.01-perturbed twin
    by_id = cells.set_index("vec_id").ivf_cell
    assert by_id[0] == by_id[1]


def test_lsh_recovers_close_neighbor(vectors):
    from vinum_spark.operators import lsh_bucket_topk

    q = vectors.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    top = lsh_bucket_topk(vectors, q, k=2, n_planes=8, hamming_radius=1).toPandas()
    assert 0 in top.vec_id.tolist()
    assert 1 in top.vec_id.tolist()  # 0.01-perturbed twin shares the bucket
    assert 2 not in top.vec_id.tolist()  # opposite vector is far in sign-LSH
