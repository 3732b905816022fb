"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — one codegen'd projection
(``zip_with`` + ``aggregate``) followed by Catalyst's fused
TakeOrderedAndProject (no full sort, no shuffle of the data itself;
per-partition top-k then driver merge of k*partitions rows).

Scale path: random-hyperplane LSH — a bucket signature computed
map-side; candidates = rows whose signature is within a Hamming radius
of the query's, verified by exact cosine. At 100 TB the signature can be
precomputed and bucketed/partitioned on disk so a query touches only
matching partitions.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_array(vals: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_cosine_similarity(
    df: DataFrame,
    query_vec: Sequence[float],
    vec_col: str = "embedding",
    out: str = "cosine",
) -> DataFrame:
    """Add cosine similarity to a fixed query vector (codegen'd, no UDF)."""
    v = F.col(vec_col)
    q = _lit_array(query_vec)
    qnorm = float(np.linalg.norm(np.asarray(query_vec, dtype="float64")))
    cos = _dot(v, q) / (_norm(v) * F.lit(qnorm))
    return df.withColumn(out, cos)


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: the exact baseline every ANN variant is
    measured against. ``orderBy().limit(k)`` fuses to
    TakeOrderedAndProject — scales as a single map + small driver merge.

    Ties at the k boundary are broken by ``id_col`` so results are
    deterministic across partitionings.
    """
    scored = with_cosine_similarity(df, query_vec, vec_col)
    return (
        scored.select(id_col, F.round("cosine", 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def lsh_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    vec_col: str = "embedding",
    out: str = "lsh_sig",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane signature: bit p = sign(v · plane_p). Pure
    built-ins; at scale, write once and bucket by it."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = F.col(vec_col)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        sig = sig + F.when(
            _dot(v, _lit_array(planes[p])) > 0,
            F.shiftleft(F.lit(1).cast("long"), p),
        ).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out, sig)


def ivf_index(
    df: DataFrame,
    dim: int,
    n_cells: int = 16,
    vec_col: str = "embedding",
    out: str = "ivf_cell",
    seed: int = 42,
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest of
    ``n_cells`` fixed random centroids (deterministic seed).

    The argmin is computed as ``array_position(min(dists))`` over a
    codegen'd array of n_cells dot-product distances — no UDF. At scale,
    write once partitioned/bucketed by ``ivf_cell`` so a query scans only
    ``nprobe`` cells' files (partition pruning), the classic IVF layout.
    Real pipelines train centroids with k-means; fixed random centroids
    keep this deterministic and dependency-free, and the query path is
    identical.
    """
    centroids = _hyperplanes(dim, n_cells, seed)
    centroids = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    v = F.col(vec_col)
    dists = F.array(
        *[(-_dot(v, _lit_array(centroids[c]))) for c in range(n_cells)]
    )
    cell = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return df.withColumn(out, cell)


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate NN via IVF: score only vectors in the ``nprobe`` cells
    whose centroids are nearest the query, then exact cosine top-k."""
    q = np.asarray(query_vec, dtype="float64")
    centroids = _hyperplanes(len(q), n_cells, seed)
    centroids = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    order = np.argsort(-(centroids @ q))
    probe_cells = [int(c) for c in order[:nprobe]]
    indexed = ivf_index(df, len(q), n_cells, vec_col, seed=seed)
    candidates = indexed.filter(F.col("ivf_cell").isin(probe_cells))
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)


def lsh_bucket_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 16,
    hamming_radius: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate NN: candidates within ``hamming_radius`` of the query's
    hyperplane signature, then exact cosine top-k on candidates only.

    The signature filter is a codegen'd ``bit_count(xor)`` — at 100 TB
    with signatures precomputed and files bucketed on them this becomes a
    partition-pruned scan instead of a full pass.
    """
    q = np.asarray(query_vec, dtype="float64")
    planes = _hyperplanes(len(q), n_planes, seed)
    q_sig = 0
    for p in range(n_planes):
        if float(planes[p] @ q) > 0:
            q_sig |= 1 << p
    signed = lsh_signature(df, len(q), n_planes, vec_col, seed=seed)
    candidates = signed.filter(
        F.bit_count(F.col("lsh_sig").bitwiseXOR(F.lit(q_sig))) <= hamming_radius
    )
    return cosine_topk(candidates, query_vec, k, vec_col, id_col)
