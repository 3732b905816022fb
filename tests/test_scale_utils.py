"""Skew-salting and bucketing utilities: results must match the direct
plan, and bucketing must actually elide the exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(0, 9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    tail = spark.range(0, 1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.lit(1.0).alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_count_matches_direct(skewed):
    from vinum_spark.operators.skew import salted_count

    direct = {r["k"]: r["n"] for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in salted_count(skewed, ["k"]).collect()}
    assert salted == direct


def test_salted_sum_matches_direct(skewed):
    from vinum_spark.operators.skew import salted_sum

    direct = {r["k"]: r["s"] for r in skewed.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r["k"]: r["sum_v"] for r in salted_sum(skewed, ["k"], "v").collect()}
    for k, v in direct.items():
        assert salted[k] == pytest.approx(v)


def test_salted_join_matches_direct(spark, skewed):
    from vinum_spark.operators.skew import salted_join

    dim = spark.createDataFrame(
        [("hot", 100), ("k1", 1), ("k2", 2)], "k string, w int"
    )
    direct = skewed.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    salted = salted_join(skewed, dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    d = {r["k"]: (r["n"], r["sw"]) for r in direct.collect()}
    s = {r["k"]: (r["n"], r["sw"]) for r in salted.collect()}
    assert d == s


def test_bucketed_join_elides_exchange(spark, tmp_path):
    from vinum_spark.io.bucketing import join_is_shuffle_free, write_bucketed

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(
        orders, "orders_b", "o_orderkey", buckets=8, path=str(tmp_path / "ob")
    )
    write_bucketed(
        lineitem, "lineitem_b", "l_orderkey", buckets=8, path=str(tmp_path / "lb")
    )
    # disable broadcast so the join strategy is the bucketed SMJ
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(
            spark.table("lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert join_is_shuffle_free(joined)
        assert joined.count() > 0
        # sanity: the un-bucketed variant DOES shuffle
        plain = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        assert not join_is_shuffle_free(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from vinum_spark.io.bucketing import compact_parquet

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    df = spark.range(10000).withColumnRenamed("id", "k")
    df.repartition(64).write.parquet(src)  # 64 tiny files
    import glob

    assert len(glob.glob(f"{src}/part-*")) == 64
    n = compact_parquet(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
    assert n == 1  # 10k longs << 10 MB target
    assert len(glob.glob(f"{dst}/part-*")) == 1
    # row-for-row identical content
    assert spark.read.parquet(dst).orderBy("k").collect() == df.orderBy("k").collect()


def test_compact_parquet_partitioned_layout(spark, tmp_path):
    from vinum_spark.io.bucketing import compact_parquet
    from pyspark.sql import functions as F

    src, dst = str(tmp_path / "psrc"), str(tmp_path / "pdst")
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    )
    df.repartition(16).write.parquet(src)
    compact_parquet(spark, src, dst, target_file_bytes=64 * 1024 * 1024,
                    partition_cols="p")
    out = spark.read.parquet(dst)
    assert out.count() == 1000
    assert sorted(r["p"] for r in out.select("p").distinct().collect()) == [0, 1, 2]


def test_compact_parquet_high_cardinality_partitions(spark, tmp_path):
    """1000 hive partitions must plan and run in bounded time: the
    per-partition file-count frame is broadcast-JOINED on the key, not
    inlined as a 1000-branch literal when-chain (which explodes plan
    size and driver memory at real partition cardinalities)."""
    import time

    from vinum_spark.io.bucketing import compact_parquet
    from pyspark.sql import functions as F

    src, dst = str(tmp_path / "hsrc"), str(tmp_path / "hdst")
    df = spark.range(20000).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("p")
    )
    df.write.partitionBy("p").parquet(src)
    t0 = time.monotonic()
    compact_parquet(spark, src, dst, target_file_bytes=64 * 1024 * 1024,
                    partition_cols="p")
    assert time.monotonic() - t0 < 120
    out = spark.read.parquet(dst)
    assert out.count() == 20000
    assert out.select("p").distinct().count() == 1000


def test_compact_parquet_null_partition_values(spark, tmp_path):
    """NULL partition values keep their rows through the key join (the
    join uses eqNullSafe, matching the old literal chain's semantics)."""
    from vinum_spark.io.bucketing import compact_parquet
    from pyspark.sql import functions as F

    src, dst = str(tmp_path / "nsrc"), str(tmp_path / "ndst")
    df = spark.range(100).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, F.lit("a")).alias("p"),
    )
    df.write.partitionBy("p").parquet(src)
    compact_parquet(spark, src, dst, target_file_bytes=64 * 1024 * 1024,
                    partition_cols="p")
    out = spark.read.parquet(dst)
    assert out.count() == 100
    assert out.filter(F.col("p").isNull()).count() == 50


def test_compact_parquet_rejects_bad_target(spark, tmp_path):
    from vinum_spark.io.bucketing import compact_parquet

    with pytest.raises(ValueError, match="target_file_bytes"):
        compact_parquet(spark, str(tmp_path), str(tmp_path / "o"), 0)


def test_compact_parquet_splits_oversized_hive_partition(spark, tmp_path):
    # review regression: hashing on partition cols alone wrote ONE file
    # per hive partition regardless of size; the salt must split a
    # partition that exceeds the target into multiple files
    from vinum_spark.io.bucketing import compact_parquet
    from pyspark.sql import functions as F
    import glob

    src, dst = str(tmp_path / "skew_src"), str(tmp_path / "skew_dst")
    df = spark.range(60000).select(
        F.col("id").alias("k"),
        F.lit(0).alias("p"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    df.write.parquet(src)
    import os

    total = sum(
        os.path.getsize(f) for f in glob.glob(f"{src}/part-*")
    )
    n = compact_parquet(
        spark, src, dst, target_file_bytes=max(1, total // 4), partition_cols="p"
    )
    files = glob.glob(f"{dst}/p=0/part-*")
    assert len(files) > 1  # the oversized partition was split
    assert spark.read.parquet(dst).count() == 60000


# --------------------------------------------------------------------------
# bench_history gate (round 8)
# --------------------------------------------------------------------------


def test_bench_gate_flags_injected_regression(tmp_path):
    """The history gate must exit nonzero when a query drifts >1.5x above
    its best recorded anchor, and stay clean otherwise."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from bench_diff import gate

    hist = tmp_path / "hist.jsonl"
    anchor = {"ts": "t0", "mode": "anchor", "sf": 0.1,
              "queries": {"q54": 4.0, "q60": 0.30, "q78": 0.66}}

    # clean run: everything within 1.5x
    ok_run = {"ts": "t1", "mode": "all", "sf": 0.1,
              "queries": {"q54": 4.4, "q60": 0.41, "q78": 0.70}}
    hist.write_text(json.dumps(anchor) + "\n" + json.dumps(ok_run) + "\n")
    assert gate(history_path=str(hist)) == 0

    # injected regression: q54 at 9s vs 4s anchor
    bad_run = {"ts": "t2", "mode": "all", "sf": 0.1,
               "queries": {"q54": 9.0, "q60": 0.31, "q78": 0.70}}
    hist.write_text(json.dumps(anchor) + "\n" + json.dumps(bad_run) + "\n")
    assert gate(history_path=str(hist)) == 1

    # small-query jitter below the absolute floor must NOT trip: 0.30->0.52
    # is 1.7x but only +0.22s
    jit = {"ts": "t3", "mode": "all", "sf": 0.1,
           "queries": {"q54": 4.1, "q60": 0.52, "q78": 0.70}}
    hist.write_text(json.dumps(anchor) + "\n" + json.dumps(jit) + "\n")
    assert gate(history_path=str(hist)) == 0

    # mismatched sf records are ignored as anchors: every query counts as
    # freshly anchored, so even the 9s q54 passes (no cross-sf comparison)
    other_sf = {"ts": "t4", "mode": "all", "sf": 0.01,
                "queries": {"q54": 0.5}}
    hist.write_text(json.dumps(other_sf) + "\n" + json.dumps(bad_run) + "\n")
    assert gate(history_path=str(hist)) == 0


def test_bench_gate_median_anchor_resists_lucky_outlier(tmp_path):
    """A single abnormally fast round must not permanently ratchet the
    anchor down (the round-8 q23 false positive): the anchor is the
    MEDIAN of history, so one 0.288s outlier among 0.36-0.38s rounds
    leaves the bar at ~0.37s and a 0.55s noisy run stays under the
    0.25s absolute floor."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from bench_diff import gate

    hist = tmp_path / "hist.jsonl"
    rounds = [
        {"ts": "t0", "round": "r5", "sf": 0.1, "queries": {"q23": 0.38}},
        {"ts": "t1", "round": "r6", "sf": 0.1, "queries": {"q23": 0.36}},
        {"ts": "t2", "round": "r7", "sf": 0.1, "queries": {"q23": 0.288}},
        {"ts": "t3", "round": "r8", "sf": 0.1, "queries": {"q23": 0.55}},
    ]
    hist.write_text("".join(json.dumps(r) + "\n" for r in rounds))
    # min-anchor would read 0.55 vs 0.288 = 1.91x +0.26s -> fail;
    # median anchor 0.36 -> +0.19s under the floor -> clean
    assert gate(history_path=str(hist)) == 0

    # a genuine sustained regression still trips: 1.2s vs 0.36 median
    rounds.append({"ts": "t4", "round": "r9", "sf": 0.1,
                   "queries": {"q23": 1.2}})
    hist.write_text("".join(json.dumps(r) + "\n" for r in rounds))
    assert gate(history_path=str(hist)) == 1


def test_bench_gate_sustained_regression_cannot_self_normalize(tmp_path):
    """Round-10 fix (ADVICE r9): with a plain median-of-ALL-history
    anchor, a persistent regression keeps appending regressed records
    until they outnumber the healthy ones and the median creeps up to
    the regression — drift invisible. The median-of-best-5 anchor keeps
    the bar at the proven-healthy level: 4 healthy rounds + 5 regressed
    rounds still reads the anchor as ~0.36s, and the latest regressed
    run trips (plain all-history median would be 1.2s -> clean)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from bench_diff import gate

    hist = tmp_path / "hist.jsonl"
    rounds = [
        {"ts": f"t{i}", "round": f"r{i}", "sf": 0.1,
         "queries": {"q23": v}}
        for i, v in enumerate([0.38, 0.36, 0.35, 0.37, 1.2, 1.25, 1.2, 1.3, 1.2])
    ]
    hist.write_text("".join(json.dumps(r) + "\n" for r in rounds))
    assert gate(history_path=str(hist)) == 1
