"""Unit tests for deterministic sampling + quality-rule + PII operators."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("grp"),
    )


def test_deterministic_sample_rate_and_reproducibility(keyed):
    from vinum_spark.operators import deterministic_sample

    a = deterministic_sample(keyed, "k", 0.25, seed="s1")
    got = sorted(r["k"] for r in a.collect())
    again = sorted(r["k"] for r in deterministic_sample(keyed, "k", 0.25, seed="s1").collect())
    assert got == again  # byte-for-byte reproducible
    assert 0.18 <= len(got) / 2000 <= 0.32  # ~25% within binomial noise
    # repartitioning must not change membership (rand(seed) fails this)
    shuffled = sorted(
        r["k"] for r in deterministic_sample(keyed.repartition(13), "k", 0.25, seed="s1").collect()
    )
    assert shuffled == got


def test_deterministic_sample_matches_duckdb(keyed):
    """Engine-portability: DuckDB reproduces the exact member set."""
    from vinum_spark.operators import deterministic_sample
    from vinum_spark.operators.sampling import sample_threshold_hex

    got = sorted(r["k"] for r in deterministic_sample(keyed, "k", 0.1, seed="x").collect())
    thr = sample_threshold_hex(0.1)
    oracle = duckdb.connect().execute(
        f"""
        SELECT i FROM range(0, 2000) t(i)
        WHERE substring(md5(concat_ws(chr(31), CAST(i AS VARCHAR), 'x')), 1, 8)
              < '{thr}'
        ORDER BY i
        """
    ).fetchall()
    assert got == [r[0] for r in oracle]


def test_deterministic_sample_seeds_independent(keyed):
    from vinum_spark.operators import deterministic_sample

    a = {r["k"] for r in deterministic_sample(keyed, "k", 0.5, seed="a").collect()}
    b = {r["k"] for r in deterministic_sample(keyed, "k", 0.5, seed="b").collect()}
    overlap = len(a & b) / 2000
    assert 0.15 <= overlap <= 0.35  # independent draws -> ~25% joint


def test_deterministic_sample_fraction_bounds(keyed):
    from vinum_spark.operators import deterministic_sample

    assert deterministic_sample(keyed, "k", 0.0).count() == 0
    assert deterministic_sample(keyed, "k", 1.0).count() == 2000
    with pytest.raises(ValueError):
        deterministic_sample(keyed, "k", 1.5)


def test_stratified_sample_per_stratum_rates(keyed):
    from vinum_spark.operators import stratified_sample

    s = stratified_sample(
        keyed, "grp", {"0": 1.0, "1": 0.0}, key_col="k", seed="s", default_fraction=0.5
    )
    counts = {r["grp"]: r["n"] for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts.get("0") == 500
    assert "1" not in counts
    assert 175 <= counts.get("2", 0) <= 325 and 175 <= counts.get("3", 0) <= 325


def test_group_sample_topn_exact_count_and_deterministic(keyed):
    from vinum_spark.operators import group_sample_topn

    s = group_sample_topn(keyed, "grp", n=7, key_col="k", seed="s")
    pdf = s.toPandas()
    assert (pdf.groupby("grp").size() == 7).all()
    assert pdf.sample_rank.max() == 7
    again = group_sample_topn(keyed, "grp", n=7, key_col="k", seed="s").toPandas()
    assert sorted(pdf.k) == sorted(again.k)


def test_group_sample_topn_pushes_limit_below_sort(keyed):
    """rank<=n must prune map-side (WindowGroupLimit), not sort whole
    groups — the property that makes per-domain caps viable at 100 TB."""
    from vinum_spark.operators import group_sample_topn

    plan = group_sample_topn(keyed, "grp", n=7, key_col="k")._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_length_bucket_stats(spark):
    from vinum_spark.operators import length_bucket_stats

    df = spark.createDataFrame(
        [(10,), (40,), (70,), (100,), (100,)], "n_tokens int"
    )
    out = {
        r["bucket_lo"]: (r["n_docs"], r["sum_tokens"], r["n_packed_seqs"])
        for r in length_bucket_stats(df, bucket_width=64, pack_len=128).collect()
    }
    assert out[0] == (2, 50, 1)  # 10 + 40
    assert out[64] == (3, 270, 3)  # 70 + 100 + 100 -> ceil(270/128) = 3


def test_quality_rules_flags_boilerplate(spark):
    from vinum_spark.operators import with_quality_rules

    nav = "\n".join(["Home | About | Contact"] * 8 + ["one real sentence here"])
    clean = "A perfectly ordinary paragraph of prose.\nIt has two lines of text."
    bullets = "\n".join(["- item one", "- item two", "* item three"])
    df = spark.createDataFrame(
        [(0, nav), (1, clean), (2, bullets)], "doc_id long, text string"
    )
    pdf = with_quality_rules(df).toPandas().set_index("doc_id")
    assert pdf.loc[0, "dup_line_frac"] > 0.7
    assert not pdf.loc[0, "quality_pass"]
    assert pdf.loc[1, "dup_line_frac"] == 0.0
    assert pdf.loc[1, "quality_pass"]
    assert pdf.loc[2, "bullet_line_frac"] == 1.0
    assert not pdf.loc[2, "quality_pass"]


def test_quality_rules_empty_and_symbols(spark):
    from vinum_spark.operators import with_quality_rules

    df = spark.createDataFrame(
        [(0, ""), (1, "## ### #### words here"), (2, "ab cd ef gh")],
        "doc_id long, text string",
    )
    pdf = with_quality_rules(df).toPandas().set_index("doc_id")
    assert pdf.loc[0, "dup_line_frac"] == 0.0  # no lines -> no crash
    assert pdf.loc[1, "symbol_word_ratio"] > 0.1
    assert not pdf.loc[1, "quality_pass"]
    assert pdf.loc[2, "mean_word_len"] == 2.0


def test_pii_redaction_counts_and_text(spark):
    from vinum_spark.operators import with_pii_redacted

    df = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@example.co.uk or bob@test.io"),
            (1, "call +1-555-123-4567 today"),
            (2, "server at 192.168.0.1 is down"),
            (4, "gateway 192.168.100.1 and peer 255.255.255.255 up"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    pdf = with_pii_redacted(df).toPandas().set_index("doc_id")
    assert pdf.loc[0, "n_email"] == 2
    assert "<EMAIL>" in pdf.loc[0, "text_redacted"]
    assert "@" not in pdf.loc[0, "text_redacted"]
    assert pdf.loc[1, "n_phone"] == 1
    assert "555" not in pdf.loc[1, "text_redacted"]
    assert pdf.loc[2, "n_ipv4"] == 1
    assert "<IPV4>" in pdf.loc[2, "text_redacted"]
    assert pdf.loc[3, "text_redacted"] == "nothing sensitive here"
    assert int(pdf[["n_email", "n_phone", "n_ipv4"]].loc[3].sum()) == 0
    # 3-digit-octet IPs also match the phone pattern; ipv4 priority must
    # win: counted once, as IPs, and redacted as <IPV4> not <PHONE>
    assert pdf.loc[4, "n_ipv4"] == 2
    assert pdf.loc[4, "n_phone"] == 0
    assert "<PHONE>" not in pdf.loc[4, "text_redacted"]
    assert pdf.loc[4, "text_redacted"].count("<IPV4>") == 2


def test_sampling_predicates_are_scan_pushed(keyed, tmp_path, spark):
    """The md5-threshold predicate must survive to the scan side as a
    plain filter (map-side only, no shuffle in the plan)."""
    from vinum_spark.operators import deterministic_sample

    p = str(tmp_path / "keyed.parquet")
    keyed.write.mode("overwrite").parquet(p)
    plan = (
        deterministic_sample(spark.read.parquet(p), "k", 0.25)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # zero shuffles


def test_with_shard_deterministic_and_uniform(keyed):
    from vinum_spark.operators import with_shard

    s = with_shard(keyed, "k", 16, seed="t")
    counts = {r["shard"]: r["n"] for r in s.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(16))
    assert all(70 <= c <= 190 for c in counts.values())  # ~125 each
    again = with_shard(keyed.repartition(7), "k", 16, seed="t")
    a = sorted((r["k"], r["shard"]) for r in s.collect())
    b = sorted((r["k"], r["shard"]) for r in again.collect())
    assert a == b


def test_with_shard_matches_duckdb(keyed):
    import duckdb

    from vinum_spark.operators import with_shard

    got = sorted((r["k"], r["shard"]) for r in with_shard(keyed, "k", 8, seed="x").collect())
    oracle = duckdb.connect().execute(
        """
        SELECT i, CAST(('0x' || substring(md5(concat_ws(chr(31),
                 CAST(i AS VARCHAR), 'x')), 1, 8))::UBIGINT % 8 AS INT)
        FROM range(0, 2000) t(i) ORDER BY i
        """
    ).fetchall()
    assert got == [tuple(r) for r in oracle]


def test_export_shards_one_file_per_shard(keyed, tmp_path, spark):
    import glob
    import os

    from vinum_spark.operators import export_shards, with_shard

    out = str(tmp_path / "shards")
    export_shards(keyed, out, "k", 4, seed="e")
    for shard in range(4):
        files = glob.glob(os.path.join(out, f"shard={shard}", "*.parquet"))
        assert len(files) == 1, (shard, files)  # repartition aligned the write
    back = spark.read.parquet(out)
    assert back.count() == 2000
    # round-trip preserves the assignment
    expect = {r["k"]: r["shard"] for r in with_shard(keyed, "k", 4, seed="e").collect()}
    assert all(expect[r["k"]] == int(r["shard"]) for r in back.collect())
    # within each shard file, rows are in full-md5 order of (k, seed#order)
    import hashlib

    import pyarrow.parquet as pq

    for shard in range(4):
        f = glob.glob(os.path.join(out, f"shard={shard}", "*.parquet"))[0]
        ks = pq.read_table(f).column("k").to_pylist()
        def okey(k):
            return hashlib.md5(f"{k}\x1fe#order".encode()).hexdigest()
        assert ks == sorted(ks, key=lambda k: (okey(k), k)), shard


def test_repetition_stats_flags_stuffing(spark):
    from vinum_spark.operators import repetition_stats

    stuffed = " ".join(["buy cheap pills"] * 20)
    normal = "the quick brown fox jumps over one lazy dog near a river bank"
    df = spark.createDataFrame(
        [(0, stuffed), (1, normal), (2, "single")], "doc_id long, text string"
    )
    pdf = repetition_stats(df).toPandas().set_index("doc_id")
    # "cheap pills" / "pills buy" / "buy cheap" each ~20/59 of grams
    assert pdf.loc[0, "top_ngram_frac"] > 0.3
    assert pdf.loc[1, "top_ngram_frac"] < 0.15
    assert 2 not in pdf.index  # one word -> no 2-grams -> absent


def test_vocab_topk_counts_and_plan(spark):
    from vinum_spark.operators import vocab_topk

    df = spark.createDataFrame(
        [(0, "the cat and the dog"), (1, "the dog runs"), (2, "a cat sleeps")],
        "doc_id long, text string",
    )
    pdf = vocab_topk(df, k=3).toPandas()
    assert pdf.token.tolist() == ["the", "cat", "dog"]  # 3, 2, 2 (tie by text)
    assert pdf.n_occurrences.tolist() == [3, 2, 2]
    assert pdf.n_docs.tolist() == [2, 2, 2]
    plan = vocab_topk(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k fused, no global sort


def test_dsir_select_prefers_target_like_docs(spark):
    """DSIR's defining property: raw documents sharing the TARGET
    corpus's vocabulary get higher importance weights than
    out-of-domain junk, so the selected set is dominated by
    target-like docs; selection is deterministic across calls; k
    bounds the output; zero-token docs are candidates (weight 0),
    never crashes."""
    from vinum_spark.operators.sampling import dsir_select

    target = spark.createDataFrame(
        [(900 + i, "physics energy quantum field theory particle wave")
         for i in range(5)],
        "doc_id long, text string",
    )
    likes = [(i, "quantum field energy particle physics wave theory state")
             for i in range(20)]
    junk = [(100 + i, "recipe butter flour sugar oven bake whisk dough")
            for i in range(20)]
    empties = [(200, ""), (201, "!!!")]
    raw = spark.createDataFrame(
        likes + junk + empties, "doc_id long, text string"
    )
    sel = dsir_select(raw, target, k=15, n_buckets=256, seed="t")
    rows = sel.collect()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == 15
    # overwhelmingly the target-like docs: junk can sneak in only via
    # Gumbel noise, which cannot beat a decisive log-weight gap often
    n_like = sum(1 for i in ids if i < 100)
    assert n_like >= 12, ids
    # deterministic: same inputs -> same selection and scores
    again = dsir_select(raw, target, k=15, n_buckets=256, seed="t").collect()
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (r["doc_id"], r["score"]) for r in again
    ]
    # a different seed reshuffles the Gumbel noise (scores differ)
    other = dsir_select(raw, target, k=15, n_buckets=256, seed="u").collect()
    assert [(r["doc_id"], r["score"]) for r in rows] != [
        (r["doc_id"], r["score"]) for r in other
    ]


def test_dsir_select_plan_shape(spark):
    """Scale pins: the 1024-row log-ratio table joins BROADCAST (the
    corpus never shuffles for the lookup) and the final top-k is a
    TakeOrderedAndProject, not a global sort."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.sampling import dsir_select

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dsir_select(
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
        k=50,
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
