"""Partition-count invariance — the distributed-correctness property.

On a real cluster the same table arrives as hundreds of splits, not the
one partition a small local parquet file scans as. Forcing
``spark.sql.files.maxPartitionBytes`` down to 64 KB makes every scan
split into many partitions (verified by a probe), then each
representative query must STILL hash-match its DuckDB oracle: window
orders, survivor choices, running sums, broadcast probes, and salted
aggregations must not depend on partitioning luck. A query that passes
only in the single-partition layout would silently corrupt results at
1000 executors.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from vinum_spark.inventory import QUERIES, TABLES, oracle_sql

SF_DIR = "/root/testdata/sf0.001"

# one per operator family whose semantics could conceivably depend on
# partitioning: survivor windows, running sums, label propagation,
# candidate buckets, broadcast probes, ordered reassembly
REPRESENTATIVES = [
    "q01_pricing_summary",        # partial+final agg
    "q18_window_topk_per_group",  # rank window
    "q27_dedup_exact",            # survivor window on fingerprint
    "q29_minhash_lsh_dedup",      # shingle→minhash→band buckets→verify
    "q33_asof_join",              # union + window carry
    "q57_skew_salted_agg",        # two-phase salted agg
    "q63_dedup_clusters",         # iterative label propagation
    "q66_group_topn_sample",      # per-group md5-rank cap
    "q68_decontamination",        # broadcast gram probe
    "q71_pack_sequences",         # running sum inside md5 shards
    "q74_mixture_sample",         # per-stratum quality window cut
    "q76_encode_tokens",          # ordered id reassembly
    "q77_ann_pq",                 # sample-trained codebooks + ADC buckets
    "q78_knn_join",               # block-bucket grouped apply + bounded re-rank
    "q81_audio_decode",           # build+decode kernels across odd splits
    "q84_vorbis_decode",          # Ogg encode+full-decode across odd splits
]


@pytest.fixture(scope="module")
def many_partition_spark(spark):
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        # probe: the biggest table must actually split now
        n = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").rdd.getNumPartitions()
        assert n > 1, f"maxPartitionBytes knob ineffective (got {n} partition)"
        yield spark
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_invariant_under_many_partitions(many_partition_spark, oracle_con, name):
    sdf = QUERIES[name].fn(many_partition_spark, SF_DIR).toPandas()
    odf = oracle_con.execute(oracle_sql()[name]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert s.shape == o.shape
    for c in cols:
        if s[c].dtype.kind in "fciu":
            assert np.allclose(
                s[c].astype("float64"), o[c].astype("float64")
            ), c
        else:
            assert (s[c].astype(str) == o[c].astype(str)).all(), c


@pytest.fixture(scope="module")
def odd_reducer_spark(spark):
    """Different reducer count than the pinned 32 — what actually
    changes when the same job lands on a different-sized cluster."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize(
    "name",
    [
        "q27_dedup_exact",
        "q29_minhash_lsh_dedup",
        "q63_dedup_clusters",
        "q71_pack_sequences",
        "q74_mixture_sample",
        "q76_encode_tokens",
    ],
)
def test_result_invariant_under_odd_reducer_count(odd_reducer_spark, oracle_con, name):
    sdf = QUERIES[name].fn(odd_reducer_spark, SF_DIR).toPandas()
    odf = oracle_con.execute(oracle_sql()[name]).df()
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert s.shape == o.shape
    for c in cols:
        if s[c].dtype.kind in "fciu":
            assert np.allclose(s[c].astype("float64"), o[c].astype("float64")), c
        else:
            assert (s[c].astype(str) == o[c].astype(str)).all(), c
