"""Unit tests for the round-7 training-pipeline additions:
decontamination, cross-document boilerplate removal, corpus-LM quality
scoring, sequence packing, incremental (store-backed) dedup, and BM25
retrieval. Tiny synthetic frames; engine-parity is separately pinned by
the sf0.001 oracle gates in test_oracle_gates.py (q68-q73)."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from vinum_spark.operators.dedup import contaminated_docs, dedup_against_store
from vinum_spark.operators.sampling import pack_sequences
from vinum_spark.operators.text import (
    bm25_topk,
    lm_quality_score,
    remove_boilerplate,
    with_fingerprint,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta something else entirely"),
        (2, "unrelated words nowhere near the benchmark text"),
        (3, "totally disjoint vocabulary lives here friend"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# contaminated_docs
# ---------------------------------------------------------------------------


def test_contamination_flags_overlapping_docs_only(spark, corpus):
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    out = contaminated_docs(corpus, eval_df, n=4).collect()
    hits = {r["doc_id"]: r["n_gram_hits"] for r in out}
    # docs 0 and 1 contain the eval 4-gram "alpha beta gamma delta"
    assert set(hits) == {0, 1}
    assert all(v >= 1 for v in hits.values())


def test_contamination_counts_distinct_grams(spark):
    # doc repeats the eval gram twice but it's ONE distinct gram
    corpus = spark.createDataFrame(
        [(0, "a b c d x a b c d")], "doc_id long, text string"
    )
    eval_df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    out = contaminated_docs(corpus, eval_df, n=4).collect()
    assert len(out) == 1 and out[0]["n_gram_hits"] == 1


def test_contamination_eval_side_is_broadcast(spark, corpus):
    eval_df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = contaminated_docs(corpus, eval_df, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# remove_boilerplate
# ---------------------------------------------------------------------------


def test_boilerplate_segment_removed_everywhere(spark):
    # "subscribe to our newsletter" = one 4-word segment leading 3 of 4
    # docs (75% > 50% threshold) -> removed from each; unique tails stay.
    rows = [
        (0, "subscribe to our newsletter alpha beta gamma delta"),
        (1, "subscribe to our newsletter epsilon zeta eta theta"),
        (2, "subscribe to our newsletter iota kappa lambda mu"),
        (3, "original reporting with real content here today now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate(df, max_doc_frac=0.5, width=4).collect()
    }
    assert out[0]["clean_text"] == "alpha beta gamma delta"
    assert out[0]["n_removed"] == 1 and out[0]["n_segments"] == 2
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"].startswith("original reporting")


def test_boilerplate_all_removed_keeps_row_with_empty_text(spark):
    rows = [(i, "same four words here") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_boilerplate(df, max_doc_frac=0.5, width=4).collect()
    assert len(out) == 4
    assert all(r["clean_text"] == "" and r["n_removed"] == 1 for r in out)


def test_boilerplate_preserves_segment_order(spark):
    # boilerplate in the MIDDLE; remaining segments keep original order
    rows = [
        (0, "one two three four junk junk junk junk five six seven eight"),
        (1, "junk junk junk junk other words live here today friend ok"),
        (2, "junk junk junk junk more unrelated filler content here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_boilerplate(df, max_doc_frac=0.5, width=4).collect()}
    assert out[0]["clean_text"] == "one two three four five six seven eight"


# ---------------------------------------------------------------------------
# lm_quality_score
# ---------------------------------------------------------------------------


def test_lm_score_prefers_corpus_typical_text(spark):
    rows = [(i, "the cat sat on the mat") for i in range(9)] + [(9, "zqxjkw vbpzq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["lm_score"] for r in lm_quality_score(df).collect()}
    typical = out[0]
    weird = out[9]
    assert typical > weird  # mojibake scores lower than corpus-typical text


def test_lm_score_skips_sub_bigram_docs(spark):
    df = spark.createDataFrame(
        [(0, "ab"), (1, "x"), (2, "")], "doc_id long, text string"
    )
    ids = [r["doc_id"] for r in lm_quality_score(df).collect()]
    assert ids == [0]


def test_lm_score_is_mean_log_prob(spark):
    # one doc "aa": model sees 1 bigram, prefix 'a' count 1, vocab {a}=1
    # -> P = (1+1)/(1+1*1) = 1.0, ln = 0.0
    df = spark.createDataFrame([(0, "aa")], "doc_id long, text string")
    out = lm_quality_score(df).collect()
    assert out[0]["lm_score"] == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sized_docs(spark):
    rows = [(i, 100 + (i % 7) * 50) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_sequences_budget_stripes(spark, sized_docs):
    out = pack_sequences(sized_docs, "n_tokens", "doc_id", budget=500, n_shards=4)
    rows = out.collect()
    # independent check: per shard, sort by seq_pos and confirm the
    # offsets are exactly the running sum of lengths in that order and
    # the stripe index follows from the INDEPENDENTLY recomputed offset
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in per_shard.values():
        shard_rows.sort(key=lambda r: r["seq_pos"])
        running = 0
        for r in shard_rows:
            assert r["seq_pos"] == running
            assert r["seq_id"] == running // 500
            running += r["n_tokens"]


def test_pack_sequences_deterministic_across_partitionings(spark, sized_docs):
    a = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["seq_pos"])
        for r in pack_sequences(sized_docs, "n_tokens", "doc_id", 500, 4).collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["seq_pos"])
        for r in pack_sequences(
            sized_docs.repartition(13), "n_tokens", "doc_id", 500, 4
        ).collect()
    }
    assert a == b


def test_pack_sequences_rejects_bad_budget(sized_docs):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(sized_docs, "n_tokens", "doc_id", budget=0)


# ---------------------------------------------------------------------------
# dedup_against_store
# ---------------------------------------------------------------------------


def test_store_hits_dropped_batch_dups_collapsed(spark):
    batch = spark.createDataFrame(
        [
            (10, "seen before"),
            (11, "brand new text"),
            (12, "brand new text"),  # in-batch dup of 11
            (13, "also new"),
        ],
        "doc_id long, text string",
    )
    store = with_fingerprint(
        spark.createDataFrame([(0, "seen before")], "doc_id long, text string")
    ).select("fingerprint")
    out = sorted(r["doc_id"] for r in dedup_against_store(batch, store).collect())
    assert out == [11, 13]


def test_store_normalization_matches_fingerprint(spark):
    # store saw the normalized form; batch carries messy whitespace/case
    batch = spark.createDataFrame(
        [(5, "  Seen   BEFORE ")], "doc_id long, text string"
    )
    store = with_fingerprint(
        spark.createDataFrame([(0, "seen before")], "doc_id long, text string")
    ).select("fingerprint")
    assert dedup_against_store(batch, store).count() == 0


# ---------------------------------------------------------------------------
# bm25_topk
# ---------------------------------------------------------------------------


def test_bm25_ranks_matching_docs_first(spark):
    rows = [
        (0, "spark spark spark engine"),
        (1, "spark engine"),
        (2, "engine room only"),
        (3, "nothing relevant at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, terms=["spark"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 0  # highest tf wins
    assert set(ids) == {0, 1}  # non-matching docs don't appear


def test_bm25_multi_term_and_k(spark):
    rows = [
        (0, "alpha beta"),
        (1, "alpha gamma"),
        (2, "beta gamma"),
        (3, "delta delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, terms=["alpha", "beta"], k=2).collect()
    assert len(out) == 2
    assert out[0]["doc_id"] == 0  # matches both terms


def test_bm25_case_insensitive_terms(spark):
    df = spark.createDataFrame([(0, "Spark ENGINE")], "doc_id long, text string")
    assert bm25_topk(df, terms=["SPARK"], k=5).count() == 1


def test_bm25_rejects_empty_terms(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="query term"):
        bm25_topk(df, terms=[], k=5)


# ---------------------------------------------------------------------------
# mixture_sample
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mix_corpus(spark):
    rows = []
    for i in range(10):
        rows.append((i, "web", 100, 10.0 - i))      # quality 10..1
    for i in range(10, 20):
        rows.append((i, "books", 100, 30.0 - i))    # quality 20..11
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long, quality double"
    )


def test_mixture_fills_each_stratum_to_its_share(spark, mix_corpus):
    from vinum_spark.operators.sampling import mixture_sample

    out = mixture_sample(
        mix_corpus, "source", {"web": 0.5, "books": 0.5}, budget=600,
        length_col="n_tokens", quality_col="quality", key_col="doc_id",
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # 300 tokens/stratum at 100 each -> top-3 quality docs per stratum
    assert sorted(by_src["web"]) == [0, 1, 2]
    assert sorted(by_src["books"]) == [10, 11, 12]


def test_mixture_unlisted_stratum_gets_nothing(spark, mix_corpus):
    from vinum_spark.operators.sampling import mixture_sample

    out = mixture_sample(
        mix_corpus, "source", {"web": 1.0}, budget=200,
        length_col="n_tokens", quality_col="quality", key_col="doc_id",
    ).collect()
    assert {r["source"] for r in out} == {"web"}


def test_mixture_straddles_boundary_by_at_most_one_doc(spark, mix_corpus):
    from vinum_spark.operators.sampling import mixture_sample

    # share = 250 tokens: docs at cumulative-before 0, 100, 200 qualify
    # (200 < 250) -> 3 docs, 300 tokens — one straddler past the share
    out = mixture_sample(
        mix_corpus, "source", {"web": 1.0}, budget=250,
        length_col="n_tokens", quality_col="quality", key_col="doc_id",
    ).collect()
    assert len(out) == 3


def test_mixture_rejects_bad_budget(mix_corpus):
    from vinum_spark.operators.sampling import mixture_sample

    with pytest.raises(ValueError, match="budget"):
        mixture_sample(
            mix_corpus, "source", {"web": 1.0}, budget=0,
            length_col="n_tokens", quality_col="quality", key_col="doc_id",
        )


def test_pack_sequences_matches_python_mirror(spark, sized_docs):
    """Independent reimplementation of the packing rule in pure Python
    (hashlib md5) — guards the md5-rank/shard conventions the DuckDB
    oracles also rely on, without Spark or DuckDB in the loop."""
    import hashlib

    rows = [(r["doc_id"], r["n_tokens"]) for r in sized_docs.collect()]
    fk = {i: hashlib.md5(f"{i}\x1f0".encode()).hexdigest() for i, _ in rows}
    expected = {}
    shards = {}
    for i, n in rows:
        shards.setdefault(int(fk[i][:8], 16) % 4, []).append((fk[i], i, n))
    for shard, docs in shards.items():
        docs.sort()
        before = 0
        for _, i, n in docs:
            expected[i] = (shard, before // 500, before)
            before += n
    got = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["seq_pos"])
        for r in pack_sequences(sized_docs, "n_tokens", "doc_id", 500, 4).collect()
    }
    assert got == expected


def test_bm25_empty_corpus_returns_empty(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = bm25_topk(df, terms=["spark"], k=5)
    assert out.columns == ["doc_id", "bm25"]
    assert out.count() == 0


# ---------------------------------------------------------------------------
# strip_html / normalize_text
# ---------------------------------------------------------------------------


def test_strip_html_basic_extraction(spark):
    from vinum_spark.operators.text import strip_html

    html = (
        "<html><head><style>p {color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Title</h1><p>Hello &amp; welcome to the "
        "<b>corpus</b>.</p><!-- nav --><div>Second&nbsp;block</div></body></html>"
    )
    df = spark.createDataFrame([(0, html)], "doc_id long, text string")
    out = strip_html(df).collect()[0]["clean_text"]
    assert "Title" in out and "Hello & welcome to the corpus" in out
    assert "Second block" in out
    assert "<" not in out and "script" not in out and "color" not in out


def test_strip_html_plain_text_passthrough(spark):
    from vinum_spark.operators.text import strip_html

    df = spark.createDataFrame([(0, "no markup here")], "doc_id long, text string")
    assert strip_html(df).collect()[0]["clean_text"] == "no markup here"


def test_normalize_text_folds_unicode_variants(spark):
    from vinum_spark.operators.text import normalize_text

    rows = [
        (0, "\ufb01le \u201cquoted\u201d \u2014 ok"),  # ligature, smart quotes, em-dash
        (1, "\uff46\uff55\uff4c\uff4c\uff57\uff49\uff44\uff54\uff48"),  # full-width
        (2, "zero\u200bwidth\x07ctrl"),  # zero-width + control chars
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["norm_text"] for r in normalize_text(df).collect()}
    assert out[0] == 'file "quoted" - ok'
    assert out[1] == "fullwidth"
    assert out[2] == "zerowidthctrl"
    assert out[3] is None


def test_normalize_makes_visually_equal_docs_hash_equal(spark):
    from vinum_spark.operators.text import normalize_text, with_fingerprint

    rows = [(0, "\ufb01le  \u201cA\u201d"), (1, 'file "A"')]
    df = normalize_text(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    fps = with_fingerprint(df, col="norm_text").select("fingerprint").collect()
    assert fps[0]["fingerprint"] == fps[1]["fingerprint"]


def test_normalize_text_is_arrow_batched_not_row_at_a_time(spark):
    from vinum_spark.operators.text import normalize_text

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = normalize_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# prepare_corpus (composed pipeline)
# ---------------------------------------------------------------------------


def test_prepare_corpus_equals_manual_chain(spark):
    """The one-call pipeline must produce EXACTLY what chaining the
    standalone (individually oracle-gated) operators produces."""
    from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus
    from vinum_spark.operators.dedup import dedup_exact
    from vinum_spark.operators.sampling import with_shard
    from vinum_spark.operators.text import with_quality_rules

    rows = [
        (i, f"some realistic words here item {i % 5} with content", f"src{i % 2}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    got = prepare_corpus(df, CorpusConfig(n_shards=4)).select(
        "doc_id", "text", "shard"
    )
    manual = with_shard(
        dedup_exact(
            with_quality_rules(df).filter("quality_pass"), id_col="doc_id"
        ),
        "doc_id",
        4,
    ).select("doc_id", "text", "shard")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, manual.collect()))


def test_prepare_corpus_despan_equals_manual_chain(spark):
    """The despan_ngram stage composes the standalone (q108-gated)
    remove_duplicated_spans between dedup and decontamination — the
    Lee et al. 2022 order — and must equal chaining the operators by
    hand: same survivors, same span-stripped text, with the
    decontamination grams probing the POST-surgery text (a gram
    straddling a removed span must not match)."""
    from vinum_spark.operators.dedup import (
        contaminated_docs,
        dedup_exact,
        remove_duplicated_spans,
    )
    from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus

    boiler = "all rights reserved contact us for details"
    rows = [
        (1, f"unique alpha body one {boiler} trailing words"),
        (2, f"{boiler} unique beta body two continues"),
        (3, "wholly unique document three nothing shared"),
        (3000, "wholly unique document three nothing shared"),  # exact dup
        (4, "benchmark overlap four evaluation phrase here today"),
        (5, "tiny"),  # < n tokens: despan must pass it through
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # MIXED-CASE, punctuated eval text: the despan stage rewrote the
    # corpus into lowercase token form, so the pipeline must
    # canonicalize the eval side the same way or this contamination is
    # silently missed (one-side-only normalization, the documented
    # failure mode)
    eval_df = spark.createDataFrame(
        [(9, "Benchmark OVERLAP four, Evaluation!")],
        "doc_id long, text string",
    )
    n = 4
    got = prepare_corpus(
        df,
        CorpusConfig(
            quality_filter=False,
            dedup=True,
            despan_ngram=n,
            decontaminate_against=eval_df,
            decontaminate_ngram=4,
        ),
    ).select("doc_id", "text")

    dd = dedup_exact(df, id_col="doc_id")
    rm = remove_duplicated_spans(dd, n=n).select(
        "doc_id", F.col("kept_text").alias("text")
    )
    # the manual chain canonicalizes the eval text exactly as the
    # pipeline does (token extraction + single-space rejoin)
    eval_canon = eval_df.withColumn(
        "text",
        F.concat_ws(
            " ", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ),
    )
    hits = contaminated_docs(rm, eval_canon, n=4).select("doc_id")
    manual = rm.join(hits, "doc_id", "left_anti").select("doc_id", "text")
    got_rows = sorted(map(tuple, got.collect()))
    assert got_rows == sorted(map(tuple, manual.collect()))
    by_id = dict(got_rows)
    assert 3000 not in by_id          # dedup dropped the exact copy
    assert 4 not in by_id             # decontaminated
    assert by_id[5] == "tiny"         # short doc passed through whole
    assert boiler not in by_id[1] and boiler not in by_id[2]  # despanned


def test_prepare_corpus_stream_rejects_despan(spark):
    """despan needs corpus-wide window counts — the streaming twin must
    refuse it toward the batch refinement pass, like the other
    cross-document stages."""
    import pytest

    from vinum_spark.operators.pipeline import (
        CorpusConfig,
        prepare_corpus_stream,
    )

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS doc_id", "'x' AS text", "timestamp AS ts")
    )
    with pytest.raises(ValueError, match="despan_ngram"):
        prepare_corpus_stream(stream, CorpusConfig(despan_ngram=8))


def test_prepare_corpus_decontaminates(spark):
    from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta unique tail one"),
            (1, "clean words entirely different from benchmark"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(9, "alpha beta gamma delta")], "doc_id long, text string"
    )
    out = prepare_corpus(
        corpus,
        CorpusConfig(
            quality_filter=False,
            dedup=False,
            decontaminate_against=eval_df,
            decontaminate_ngram=4,
        ),
    )
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_prepare_corpus_full_stack_runs(spark):
    """All stages on at once over markup-wrapped input."""
    from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus

    rows = [
        (i, f"<p>genuine textual content number {i} appears here today</p>",
         f"src{i % 2}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    eval_df = spark.createDataFrame(
        [(99, "never matches anything meaningful whatsoever")],
        "doc_id long, text string",
    )
    out = prepare_corpus(
        df,
        CorpusConfig(
            strip_html=True,
            normalize=True,
            quality_filter=True,
            dedup=True,
            decontaminate_against=eval_df,
            decontaminate_ngram=4,
            mixture_weights={"src0": 0.5, "src1": 0.5},
            mixture_budget=10000,
            n_shards=4,
        ),
    ).collect()
    assert len(out) > 0
    assert all("<p>" not in r["text"] for r in out)
    assert all(0 <= r["shard"] < 4 for r in out)


def test_strip_html_double_escaped_entities_stay_text(spark):
    # review regression: '&amp;lt;' renders as '&lt;' in a browser and
    # must NOT decode twice into a real '<'
    from vinum_spark.operators.text import strip_html

    df = spark.createDataFrame(
        [(0, "<p>5 &amp;lt; 6 &amp; 7 &gt; 2</p>")], "doc_id long, text string"
    )
    out = strip_html(df).collect()[0]["clean_text"]
    assert out == "5 &lt; 6 & 7 > 2"


def test_normalize_one_composes_after_format_strip():
    # review regression: stripping a soft hyphen between base letter and
    # combining mark must still produce the composed (NFC) form
    from vinum_spark.operators.text import _normalize_one

    assert _normalize_one("a\u00ad\u0301") == _normalize_one("a\u0301") == "\u00e1"


def test_prepare_corpus_mixture_custom_quality_col(spark):
    # review regression: non-default mixture_quality_col crashed on an
    # unresolvable n_chars column
    from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus

    rows = [(i, f"words here number {i}", "web", float(i)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, my_score double"
    )
    out = prepare_corpus(
        df,
        CorpusConfig(
            quality_filter=False,
            dedup=False,
            mixture_weights={"web": 1.0},
            mixture_budget=50,
            mixture_quality_col="my_score",
        ),
    ).collect()
    assert len(out) > 0
    # highest my_score docs picked first
    assert max(r["doc_id"] for r in out) == 9


def test_prepare_corpus_decontaminates_normalized_eval(spark):
    # review regression: with normalize on, the eval set must be
    # normalized too or unicode variants of benchmark text slip through
    from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus

    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta tail"), (1, "clean other words here")],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(9, "\uff41lpha beta gamma delta")],  # full-width 'a' folds to 'a'
        "doc_id long, text string",
    )
    out = prepare_corpus(
        corpus,
        CorpusConfig(
            normalize=True, quality_filter=False, dedup=False,
            decontaminate_against=eval_df, decontaminate_ngram=4,
        ),
    ).collect()
    assert [r["doc_id"] for r in out] == [1]


# ---------------------------------------------------------------------------
# encode_tokens
# ---------------------------------------------------------------------------


def test_encode_tokens_order_oov_and_truncation(spark):
    from vinum_spark.operators.text import encode_tokens

    df = spark.createDataFrame(
        [(0, "the cat saw the dog"), (1, "unknown words only")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame(
        [("the", 1), ("cat", 2), ("dog", 3)], "token string, token_id int"
    )
    out = {r["doc_id"]: r for r in encode_tokens(df, vocab).collect()}
    assert out[0]["token_ids"] == [1, 2, 0, 1, 3]  # position order, OOV=0
    assert out[0]["seq_len"] == 5 and out[0]["n_oov"] == 1
    assert out[1]["token_ids"] == [0, 0, 0] and out[1]["n_oov"] == 3
    trunc = {
        r["doc_id"]: r
        for r in encode_tokens(df, vocab, max_len=3).collect()
    }
    assert trunc[0]["token_ids"] == [1, 2, 0]
    assert trunc[0]["seq_len"] == 5  # pre-truncation length preserved


def test_encode_tokens_vocab_is_broadcast(spark):
    from vinum_spark.operators.text import encode_tokens

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    vocab = spark.createDataFrame([("a", 1)], "token string, token_id int")
    plan = encode_tokens(df, vocab)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_encode_tokens_rejects_bad_max_len(spark):
    from vinum_spark.operators.text import encode_tokens

    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    vocab = spark.createDataFrame([("a", 1)], "token string, token_id int")
    with pytest.raises(ValueError, match="max_len"):
        encode_tokens(df, vocab, max_len=0)


def test_encode_tokens_keeps_zero_token_docs(spark):
    # review regression: empty/whitespace-only docs must not vanish
    from vinum_spark.operators.text import encode_tokens

    df = spark.createDataFrame(
        [(0, "the cat"), (1, ""), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("the", 1)], "token string, token_id int")
    out = {r["doc_id"]: r for r in encode_tokens(df, vocab).collect()}
    assert set(out) == {0, 1, 2, 3}
    for i in (1, 2, 3):
        assert out[i]["token_ids"] == [] and out[i]["seq_len"] == 0
        assert out[i]["n_oov"] == 0


# ---------------------------------------------------------------------------
# BPE tokenizer training (round 12)


def test_learn_bpe_merges_hand_computed(spark):
    """Tiny corpus with hand-computed merges: 'low low low lower
    newest newest' — pair counts weighted by word frequency, arg-max
    by (count DESC, lexical), greedy application. First merges are
    (l,o)=4 ... verified by hand below."""
    from vinum_spark.operators.text import learn_bpe_merges

    df = spark.createDataFrame(
        [("low low low lower newest newest",)], "text string"
    )
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in learn_bpe_merges(df, n_merges=4).orderBy("merge_rank").collect()
    ]
    # vocab: low x3, lower x1, newest x2
    # iter1: (l,o)=4, (o,w)=4, (e,w)=2... arg-max ties (l,o)/(o,w) at 4
    #        -> lexical: (l,o). apply: lo w / lo w e r / n e w e s t
    # iter2: (lo,w)=4 wins. -> low / low e r / n e w e s t
    # iter3: (e,s)=2, (e,w)=2, (n,e)=2, (s,t)=2, (low,e)=1, (e,r)=1
    #        -> lexical: (e,s). -> low / low e r / n e w es t
    # iter4: (e,w)=2, (es,t)=2, (n,e)=2 -> (e,w). -> n ew es t
    assert got == [
        (1, "l", "o", 4),
        (2, "lo", "w", 4),
        (3, "e", "s", 2),
        (4, "e", "w", 2),
    ]


def test_learn_bpe_merges_greedy_chain(spark):
    """'aaaa' + merge (a,a) must apply greedily left-to-right:
    ['aa','aa'], so iteration 2 counts the (aa,aa) pair — the chain
    case where a naive every-match rule diverges from reference BPE."""
    from vinum_spark.operators.text import learn_bpe_merges

    df = spark.createDataFrame([("aaaa aaaa b",)], "text string")
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in learn_bpe_merges(df, n_merges=2).orderBy("merge_rank").collect()
    ]
    # vocab: aaaa x2, b x1. iter1: (a,a)=6 (three adjacent pairs x2
    # words). apply greedy -> ['aa','aa'] x2. iter2: (aa,aa)=2.
    assert got == [(1, "a", "a", 6), (2, "aa", "aa", 2)]


def test_learn_bpe_merges_guards(spark):
    import pytest as _pytest

    from vinum_spark.operators.text import learn_bpe_merges

    df = spark.createDataFrame([("abc",)], "text string")
    with _pytest.raises(ValueError, match="token_pattern"):
        learn_bpe_merges(df, token_pattern="[a']+")
    # early stop: single-char words only -> no pairs -> empty result
    single = spark.createDataFrame([("a b c a",)], "text string")
    assert learn_bpe_merges(single, n_merges=3).count() == 0


def test_bpe_tokenize_matches_learned_merges(spark):
    """Applying the learned table reproduces the learner's own merged
    symbols: 'low' -> ['low'], 'lower' -> ['low','e','r'], 'newest'
    -> ['n','ew','es','t'] with the 4 merges from the hand-computed
    corpus; empty/no-word docs keep a row with zero tokens."""
    from vinum_spark.operators.text import bpe_tokenize, learn_bpe_merges

    corpus = spark.createDataFrame(
        [(1, "low low low lower newest newest")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(corpus, n_merges=4)
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "... 123 ..."), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_tokenize(docs, merges).collect()
    }
    assert out[1] == (["low", "low", "e", "r", "n", "ew", "es", "t"], 8)
    assert out[2] == ([], 0)
    assert out[3] == ([], 0)


# ---------------------------------------------------------------------------
# BPE: byte-level alphabet + driver-local fast path (round 13)


def test_learn_bpe_local_equals_distributed_corpus(spark):
    """VERDICT r12 item 3: the driver-local fast path (default
    collect_cap) must reproduce the distributed loop's table EXACTLY —
    pair counts, tie-breaks, greedy application — on the real gate
    corpus, in both alphabets."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.text import learn_bpe_merges

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fast = learn_bpe_merges(docs, n_merges=16).collect()
    dist = learn_bpe_merges(docs, n_merges=16, collect_cap=0).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in dist]
    aug = docs.withColumn(
        "text", F.concat("text", F.lit(" Déjà-vu:42#"), F.col("doc_id"))
    )
    bfast = learn_bpe_merges(
        aug, n_merges=12, byte_level=True, token_pattern="[^ ]+"
    ).collect()
    bdist = learn_bpe_merges(
        aug, n_merges=12, byte_level=True, token_pattern="[^ ]+", collect_cap=0
    ).collect()
    assert [tuple(r) for r in bfast] == [tuple(r) for r in bdist]


def test_learn_bpe_local_equals_distributed_exhaustion(spark):
    """n_merges=1024 on a small corpus: both paths must run the
    vocabulary to FULL exhaustion (every word a single symbol), stop
    at the same merge count, and agree row-for-row — pinning the
    termination rule, not just the early merges."""
    from vinum_spark.operators.text import learn_bpe_merges

    df = spark.createDataFrame(
        [("low low low lower newest newest widest widest",)], "text string"
    )
    fast = learn_bpe_merges(df, n_merges=1024).collect()
    dist = learn_bpe_merges(df, n_merges=1024, collect_cap=0).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in dist]
    # exhaustion: far fewer merges than requested, and re-running with
    # exactly that many merges is a fixed point
    assert 0 < len(fast) < 32


def test_byte_syms_mapping_pins():
    """chr(0x100 + b) per UTF-8 byte; bijective (round-trips any
    string); every symbol SQL-literal-safe by construction."""
    from vinum_spark.operators.text import byte_syms

    assert byte_syms("abc") == ["š", "Ţ", "ţ"]
    for w in ["Naïve42", "δεδομένα", "数据", "a'b\\c", "tab\there"]:
        syms = byte_syms(w)
        assert all(0x100 <= ord(c) <= 0x1FF for s in syms for c in s)
        back = bytes(ord(c) - 0x100 for c in "".join(syms))
        assert back.decode("utf-8") == w


def test_byte_sym_sql_matches_python(spark):
    """The JVM-side mapping expression (hex walk + 256-entry array
    literal) agrees char-for-char with the Python ``byte_syms`` the
    pandas tokenizer seeds from."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.text import _byte_sym_sql, byte_syms

    words = ["Naïve42", "δεδομένα", "数据", "mixedΩ9!", ""]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: r["sym"]
        for r in df.select(
            "word", F.expr(_byte_sym_sql("word")).alias("sym")
        ).collect()
    }
    for w in words:
        assert got[w] == byte_syms(w), w


def test_bpe_byte_level_round_trip(spark):
    """Byte-level tokens are lossless: unmapping the concatenated
    token symbols of a document reproduces the exact UTF-8 bytes of
    its extracted words — case, digits, punctuation, and multi-byte
    scripts included (none of which the char-mode [a-z]+ alphabet can
    even represent)."""
    from vinum_spark.operators.text import (
        bpe_tokenize,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [
            (1, "Hello WORLD 123"),
            (2, "naïve café δίκτυο"),
            (3, "数据 123 数据"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    merges = learn_bpe_merges(
        docs, n_merges=6, byte_level=True, token_pattern="[^ ]+"
    )
    out = {
        r["doc_id"]: r["tokens"]
        for r in bpe_tokenize(
            docs, merges, byte_level=True, token_pattern="[^ ]+"
        ).collect()
    }
    import re

    for doc_id, text in [(1, "Hello WORLD 123"), (2, "naïve café δίκτυο"),
                         (3, "数据 123 数据")]:
        words = re.findall(r"[^ ]+", text)
        expect = "".join(words).encode("utf-8")
        back = bytes(ord(c) - 0x100 for c in "".join(out[doc_id]))
        assert back == expect, doc_id
    assert out[4] == []


def test_bpe_byte_level_accepts_any_pattern(spark):
    """Byte mode passes token_pattern as a Column literal (never
    embedded in SQL text), so patterns with quotes/backslashes —
    rejected in char mode — are fine."""
    from vinum_spark.operators.text import learn_bpe_merges

    df = spark.createDataFrame([("it's a b-c it's",)], "text string")
    got = learn_bpe_merges(
        df, n_merges=2, byte_level=True, token_pattern=r"[\w']+"
    ).collect()
    # "it's" x2 dominates: first merge inside it; the apostrophe byte
    # symbol (chr(0x100+39)) appears in the learned table
    assert len(got) == 2
    syms = "".join(r["lhs"] + r["rhs"] for r in got)
    assert all(0x100 <= ord(c) <= 0x1FF for c in syms)


def test_learn_bpe_local_incremental_matches_naive_reference():
    """The indexed incremental trainer (inverted pair index + delta
    counts + lazy max-heap) must match the naive full-recount loop
    MERGE-FOR-MERGE — counts, tie-breaks, termination — on random
    Zipf vocabularies large enough to exercise overlap counting,
    count collisions, and pair resurrection."""
    import numpy as np

    from vinum_spark.operators.text import (
        _learn_bpe_local,
        _learn_bpe_local_ref,
    )

    letters = list("abcdef")  # small alphabet -> many ties + overlaps
    for seed in (11, 12):
        rs = np.random.RandomState(seed)
        vocab = []
        for i in range(800):
            ln = 2 + int(rs.zipf(1.5)) % 10
            w = "".join(rs.choice(letters, ln))
            vocab.append((list(w), max(1, int(1e5 / (i + 1)))))
        assert _learn_bpe_local(vocab, 200) == _learn_bpe_local_ref(
            vocab, 200
        ), seed
    # overlap pinning: 'aaaa' freq-weighted, (a,a) counted per position
    v = [(list("aaaa"), 3), (list("ab"), 5)]
    got = _learn_bpe_local(v, 3)
    assert got == _learn_bpe_local_ref(v, 3)
    assert got[0] == (1, "a", "a", 9)  # 3 adjacent positions x freq 3


def test_bpe_vocab_and_encode_ids(spark):
    """GPT-2 vocab layout: ids 0-255 = base byte symbols, merge rank k
    mints id 255+k, size exactly 256+n_merges; encode_ids is lossless
    (no OOV by construction) and unmapping the id sequence through the
    vocab reproduces the exact UTF-8 bytes of the document's words."""
    from vinum_spark.operators.text import (
        bpe_encode_ids,
        bpe_tokenize,
        bpe_vocab,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "Hello WORLD 123"), (2, "naïve café δίκτυο"), (3, None)],
        "doc_id long, text string",
    )
    merges = learn_bpe_merges(
        docs, n_merges=5, byte_level=True, token_pattern="[^ ]+"
    )
    vocab = {r["token"]: r["token_id"] for r in bpe_vocab(merges).collect()}
    assert len(vocab) == 256 + 5
    assert vocab["š"] == ord("a")  # chr(0x100 + 0x61)
    assert sorted(vocab.values()) == list(range(256 + 5))

    toks = bpe_tokenize(
        docs, merges, id_col="doc_id", byte_level=True, token_pattern="[^ ]+"
    )
    enc = {
        r["doc_id"]: (r["token_ids"], r["n_tokens"])
        for r in bpe_encode_ids(toks, merges).collect()
    }
    inv = {v: k for k, v in vocab.items()}
    for doc_id, text in [(1, "Hello WORLD 123"), (2, "naïve café δίκτυο")]:
        ids, n = enc[doc_id]
        assert n == len(ids) > 0
        back = bytes(
            ord(c) - 0x100 for i in ids for c in inv[i]
        ).decode("utf-8")
        assert back == text.replace(" ", "")
    assert enc[3] == ([], 0)


def test_bpe_tokenize_map_side_equals_batch(spark):
    """The streaming-capable pure-projection tokenizer must produce
    EXACTLY the batch vocab-join operator's tokens, in both alphabets
    (same Spark-side word extraction, same rank-loop semantics)."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.text import (
        bpe_tokenize,
        bpe_tokenize_map_side,
        learn_bpe_merges,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for kw in (
        {},
        {"byte_level": True, "token_pattern": "[^ ]+"},
    ):
        merges = learn_bpe_merges(docs, n_merges=8, **kw)
        want = {
            r["doc_id"]: (r["tokens"], r["n_tokens"])
            for r in bpe_tokenize(docs, merges, **kw).collect()
        }
        got = {
            r["doc_id"]: (r["tokens"], r["n_tokens"])
            for r in bpe_tokenize_map_side(docs, merges, **kw).collect()
        }
        assert got == want and len(got) > 0


def test_bpe_tokenize_map_side_runs_on_readstream(spark, tmp_path):
    """Pure projection -> streamable: tokenizing a readStream corpus
    micro-batch-by-micro-batch lands the same rows the batch path
    computes (the prepare_corpus map-side streaming contract extended
    to the tokenizer)."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.text import (
        bpe_tokenize_map_side,
        learn_bpe_merges,
    )
    from vinum_spark.streaming.windows import run_stream_to_memory

    src = str(tmp_path / "docs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    merges = learn_bpe_merges(docs, n_merges=8)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out = bpe_tokenize_map_side(stream, merges).select(
        "doc_id", F.md5(F.concat_ws(" ", "tokens")).alias("tok_md5"),
        "n_tokens",
    )
    assert out.isStreaming
    run_stream_to_memory(out, "bpe_stream_out", mode="append")
    got = spark.table("bpe_stream_out").orderBy("doc_id").toPandas()

    want = (
        bpe_tokenize_map_side(spark.read.parquet(src), merges)
        .select(
            "doc_id", F.md5(F.concat_ws(" ", "tokens")).alias("tok_md5"),
            "n_tokens",
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert len(got) == len(want) > 0
    assert got.values.tolist() == want.values.tolist()


def test_gpt2ish_pattern_cross_engine_and_semantics(spark):
    """GPT2ISH_SPLIT_PATTERN must (a) split identically in Spark (Java
    regex) and DuckDB (RE2) — the oracle twin's precondition — and (b)
    behave like GPT-2 on the cases the docstring claims: contractions
    split off, single spaces attach to the following word, digit and
    punctuation runs separate."""
    import duckdb
    from pyspark.sql import functions as F

    from vinum_spark.operators.text import GPT2ISH_SPLIT_PATTERN as PAT

    texts = [
        "It's 2026: naïve café—δίκτυο 数据!!  trailing  spaces ",
        "a'b don't we'll I've they're x'd",
        "multi   space\ttab\nnewline",
        "",
    ]
    con = duckdb.connect()
    duck = [
        con.execute(
            "SELECT regexp_extract_all(?, ?)", [t, PAT]
        ).fetchone()[0]
        for t in texts
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r[0]
        for r in df.select(
            F.regexp_extract_all("text", F.lit(PAT), F.lit(0))
        ).collect()
    ]
    assert got == duck
    assert got[1] == ["a", "'", "b", " don", "'t", " we", "'ll",
                      " I", "'ve", " they", "'re", " x", "'d"]
    assert got[0][:4] == ["It", "'s", " 2026", ":"]


def test_bpe_tokenize_map_side_emit_ids_equals_encode_ids(spark):
    """emit_ids=True must produce exactly bpe_encode_ids' id sequences
    (same GPT-2 vocab layout), stay a pure projection, and reject char
    mode (no fixed base alphabet to assign ids over)."""
    from vinum_spark.operators.text import (
        bpe_encode_ids,
        bpe_tokenize,
        bpe_tokenize_map_side,
        learn_bpe_merges,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = {"byte_level": True, "token_pattern": "[^ ]+"}
    merges = learn_bpe_merges(docs, n_merges=8, **kw)
    want = {
        r["doc_id"]: (r["token_ids"], r["n_tokens"])
        for r in bpe_encode_ids(
            bpe_tokenize(docs, merges, **kw), merges
        ).collect()
    }
    got_df = bpe_tokenize_map_side(docs, merges, emit_ids=True, **kw)
    got = {
        r["doc_id"]: (r["token_ids"], r["n_tokens"])
        for r in got_df.collect()
    }
    assert got == want and len(got) > 0

    import pytest

    with pytest.raises(ValueError, match="byte_level"):
        bpe_tokenize_map_side(docs, merges, emit_ids=True)


def test_bpe_tokenize_emit_ids_equals_encode_ids(spark):
    """The batch operator's fused emit_ids path (tokens + ids in ONE
    corpus explode + join + groupBy cycle) must produce exactly
    bpe_encode_ids' id sequences — including empty and all-junk docs
    whose id arrays are empty — and reject char mode."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.text import (
        bpe_encode_ids,
        bpe_tokenize,
        learn_bpe_merges,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = base.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(900001, ""), (900002, None)], "doc_id long, text string"
        ).select("doc_id", F.col("text"))
    )
    kw = {"byte_level": True, "token_pattern": "[^ ]+"}
    merges = learn_bpe_merges(base, n_merges=8, **kw)
    want = {
        r["doc_id"]: (r["token_ids"], r["n_tokens"])
        for r in bpe_encode_ids(
            bpe_tokenize(docs, merges, **kw), merges
        ).collect()
    }
    fused = bpe_tokenize(docs, merges, emit_ids=True, **kw)
    got = {
        r["doc_id"]: (r["token_ids"], r["n_tokens"])
        for r in fused.collect()
    }
    assert got == want and len(got) > 0
    # the tokens column is unchanged by the fused path
    plain = {
        r["doc_id"]: r["tokens"]
        for r in bpe_tokenize(docs, merges, **kw).collect()
    }
    assert {r["doc_id"]: r["tokens"] for r in fused.collect()} == plain

    import pytest

    with pytest.raises(ValueError, match="byte_level"):
        bpe_tokenize(docs, merges, emit_ids=True)


def test_prepare_corpus_tokenize_stage(spark):
    """tokenize_with adds the tokenizer as the pipeline's final stage —
    a pure projection (no extra shuffle, no join-back), byte-level
    under the production GPT-2-ish pre-tokenizer by default, with
    model-ready token_ids — and equals applying the standalone
    operator after the untokenized pipeline."""
    from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus
    from vinum_spark.operators.text import (
        GPT2ISH_SPLIT_PATTERN,
        bpe_tokenize_map_side,
        learn_bpe_merges,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = learn_bpe_merges(
        docs, n_merges=8, byte_level=True,
        token_pattern=GPT2ISH_SPLIT_PATTERN,
    )
    base_cfg = CorpusConfig(quality_filter=True, dedup=True, n_shards=8)
    tok_cfg = CorpusConfig(
        quality_filter=True, dedup=True, n_shards=8, tokenize_with=merges
    )
    got = prepare_corpus(docs, tok_cfg)
    assert {"tokens", "n_tokens", "token_ids", "shard"} <= set(got.columns)
    want = bpe_tokenize_map_side(
        prepare_corpus(docs, base_cfg), merges,
        token_pattern=GPT2ISH_SPLIT_PATTERN, byte_level=True,
        emit_ids=True,
    )
    g = {r["doc_id"]: (r["token_ids"], r["n_tokens"], r["shard"])
         for r in got.collect()}
    w = {r["doc_id"]: (r["token_ids"], r["n_tokens"], r["shard"])
         for r in want.collect()}
    assert g == w and len(g) > 0


def test_gpt2_exact_split_equals_lookahead_twin(spark):
    """The lookahead-free sentinel emulation (Java regex, the q96 gate
    machinery) must split EXACTLY like GPT-2's true trailing-whitespace
    lookahead pattern (Python `regex`, where lookaround is legal) — on
    the documented divergence fixtures AND under fuzz over ws-heavy
    strings."""
    import random

    import regex

    from vinum_spark.operators.text import (
        GPT2_EXACT_LOOKAHEAD_PATTERN,
        GPT2ISH_SPLIT_PATTERN,
        gpt2_exact_words_col,
    )

    fixed = [
        "a  b", "a   b", "a \tb", "a\t b", "a\t\tb", " x", "x  ",
        "It's 2026: naïve café—δίκτυο 数据!!  trailing  spaces ",
        "don't we'll  I've", "a \t\t b", "", "   ", "\t", "a\x0bb",
        "num 42  43", "multi   space\ttab\nnewline",
    ]
    rng = random.Random(14)
    alphabet = list("ab '\t\n.!9数ï") + [" "] * 6
    fuzz = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(200)
    ]
    texts = fixed + fuzz
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(gpt2_exact_words_col("text")).collect()]
    want = [regex.findall(GPT2_EXACT_LOOKAHEAD_PATTERN, t) for t in texts]
    assert got == want
    # and the exact variant genuinely differs from the safe one where
    # the lookahead bites (double space before a word)
    safe = regex.findall(GPT2ISH_SPLIT_PATTERN, "a  b")
    assert safe == ["a", "  ", "b"] and want[0] == ["a", " ", " b"]


def test_gpt2_exact_merge_table_differs_from_safe(spark):
    """The q96 gate fixture must actually exercise the lookahead
    semantics: training on the ws-run-augmented corpus under
    'gpt2-exact' vs the safe pattern yields DIFFERENT merge tables
    (if they matched, the gate would be a silent re-run of q94)."""
    from vinum_spark.operators.text import (
        GPT2_EXACT,
        GPT2ISH_SPLIT_PATTERN,
        learn_bpe_merges,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" it's  doubled   \t mix\t"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit("  "),
        ),
    )
    exact = learn_bpe_merges(
        docs, n_merges=8, byte_level=True, token_pattern=GPT2_EXACT
    ).collect()
    safe = learn_bpe_merges(
        docs, n_merges=8, byte_level=True,
        token_pattern=GPT2ISH_SPLIT_PATTERN,
    ).collect()
    assert [(r["lhs"], r["rhs"], r["pair_count"]) for r in exact] != [
        (r["lhs"], r["rhs"], r["pair_count"]) for r in safe
    ]


def test_gpt2_exact_requires_byte_level(spark):
    from vinum_spark.operators.text import GPT2_EXACT, learn_bpe_merges

    docs = spark.createDataFrame([(1, "a  b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="byte_level"):
        learn_bpe_merges(docs, n_merges=1, token_pattern=GPT2_EXACT)


def test_bpe_map_side_rejects_output_column_collision(spark):
    """Re-running the tokenize stage on an already-tokenized frame must
    fail loudly at call time, not as a downstream ambiguous-reference
    error (ADVICE r13)."""
    from vinum_spark.operators.text import (
        bpe_tokenize_map_side,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "aa ab"), (2, "ab ab aa")], "doc_id long, text string"
    )
    kw = {"byte_level": True, "token_pattern": "[^ ]+"}
    merges = learn_bpe_merges(docs, n_merges=2, **kw)
    once = bpe_tokenize_map_side(docs, merges, **kw)
    with pytest.raises(ValueError, match="tokens"):
        bpe_tokenize_map_side(once, merges, **kw)


def test_collect_cap_counts_symbols_not_types(spark, monkeypatch):
    """The fast-path budget is the SUMMED SYMBOL COUNT (ADVICE r13): a
    3-type vocabulary whose words are long must take the distributed
    loop under a small cap (a per-type cap would collect it), and the
    same corpus under the default cap must take the fast path."""
    import vinum_spark.operators.text as T

    docs = spark.createDataFrame(
        [(1, "abcdefgh ijklmnop qrstuvwx abcdefgh")],
        "doc_id long, text string",
    )

    def boom(*a, **k):
        raise AssertionError("fast path taken despite symbol cap")

    monkeypatch.setattr(T, "_learn_bpe_local", boom)
    # 3 types x 8 chars = 24 symbols > cap 10 -> distributed loop
    out = T.learn_bpe_merges(docs, n_merges=2, collect_cap=10).collect()
    assert len(out) == 2
    monkeypatch.undo()
    want = T.learn_bpe_merges(docs, n_merges=2, collect_cap=0).collect()
    got = T.learn_bpe_merges(docs, n_merges=2).collect()  # default cap
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_extend_bpe_merges_continuation_law(spark):
    """extend_bpe_merges(df, learn(K), M) must equal learn(K+M) on the
    same corpus EXACTLY — ranks, pairs, counts — in char and byte mode,
    on both the driver-local fast path and the distributed loop."""
    from vinum_spark.operators.text import extend_bpe_merges, learn_bpe_merges

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def rows(df):
        return [tuple(r) for r in df.orderBy("merge_rank").collect()]

    for kw in ({}, {"byte_level": True, "token_pattern": "[^ ]+"}):
        full = rows(learn_bpe_merges(docs, n_merges=8, **kw))
        part = learn_bpe_merges(docs, n_merges=4, **kw)
        assert rows(extend_bpe_merges(docs, part, 4, **kw)) == full
    # distributed loop (collect_cap=0) end to end
    fulld = rows(learn_bpe_merges(docs, n_merges=6, collect_cap=0))
    partd = learn_bpe_merges(docs, n_merges=3, collect_cap=0)
    assert rows(extend_bpe_merges(docs, partd, 3, collect_cap=0)) == fulld


def test_extend_bpe_merges_refresh_semantics(spark):
    """On a REFRESHED corpus the existing rows pass through verbatim
    (frozen token ids) and the new merges reflect the new corpus's
    frequencies — differentially pinned against the naive local
    learner run from the prefix-applied vocabulary."""
    from collections import Counter

    from vinum_spark.operators.text import (
        _apply_rank_loop,
        extend_bpe_merges,
        learn_bpe_merges,
    )

    old = spark.createDataFrame(
        [(1, "banana band bandana"), (2, "banana ban")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "banana band"), (2, "candied candy can can"), (3, "dana nab")],
        "doc_id long, text string",
    )
    part = learn_bpe_merges(old, n_merges=3)
    got = [
        tuple(r)
        for r in extend_bpe_merges(new, part, 3).orderBy("merge_rank").collect()
    ]
    prefix = [tuple(r) for r in part.orderBy("merge_rank").collect()]
    assert got[:3] == prefix
    # independent expectation: prefix-applied new-corpus vocab through
    # the naive reference learner, ranks shifted
    pairs = [(a, b) for _, a, b, _ in prefix]
    ranks = {p: i for i, p in enumerate(pairs)}
    words = Counter(
        w
        for r in new.collect()
        for w in __import__("re").findall("[a-z]+", r["text"].lower())
    )
    vocab = [
        (_apply_rank_loop(list(w), pairs, ranks), f)
        for w, f in words.items()
    ]
    ref = _learn_bpe_local_ref_applied(vocab, 3)
    assert [(k + 3, a, b, c) for k, a, b, c in ref] == got[3:]


def _learn_bpe_local_ref_applied(vocab, n_merges):
    """Naive learner over an ALREADY-SYMBOLIZED vocab list (the ref
    twin takes (string, freq) and re-splits; here the prefix merges
    already fused multi-char symbols)."""
    from collections import Counter

    from vinum_spark.operators.text import _greedy_merge

    merges = []
    words = [(list(s), int(f)) for s, f in vocab]
    for k in range(1, n_merges + 1):
        counts = Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((k, a, b, int(c)))
        words = [
            (_greedy_merge(s, a, b) if len(s) > 1 else s, f) for s, f in words
        ]
    return merges


def test_extend_bpe_merges_validation(spark):
    from vinum_spark.operators.text import extend_bpe_merges

    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    gappy = spark.createDataFrame(
        [(1, "a", "b", 5), (3, "ab", "a", 2)],
        "merge_rank int, lhs string, rhs string, pair_count long",
    )
    with pytest.raises(ValueError, match="contiguous"):
        extend_bpe_merges(docs, gappy, 1)


def test_bpe_decode_ids_roundtrip_and_errors(spark):
    """decode(encode(text)) == text under the tiling GPT2ISH pattern
    (any merge table); out-of-vocab ids raise with the vocab bound;
    null id sequences stay null; a sequence splitting a multibyte
    char substitutes U+FFFD instead of failing the batch."""
    from pyspark.sql import Row
    from pyspark.sql.utils import PythonException

    from vinum_spark.operators.text import (
        GPT2ISH_SPLIT_PATTERN,
        bpe_decode_ids,
        bpe_tokenize_map_side,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [
            (1, "It's  2026: naïve café—δίκτυο 数据!!  tr\tailing  "),
            (2, ""),
            (3, "a  b don't\tx"),
        ],
        "doc_id long, text string",
    )
    kw = {"byte_level": True, "token_pattern": GPT2ISH_SPLIT_PATTERN}
    merges = learn_bpe_merges(docs, n_merges=6, **kw)
    enc = bpe_tokenize_map_side(docs, merges, emit_ids=True, **kw)
    got = {
        r["doc_id"]: r["text"] for r in bpe_decode_ids(enc, merges).collect()
    }
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == want

    # out-of-vocab id -> clear error naming the bound
    bad = spark.createDataFrame(
        [Row(doc_id=1, token_ids=[0, 99999])],
        "doc_id long, token_ids array<int>",
    )
    with pytest.raises(PythonException, match="outside the vocabulary"):
        bpe_decode_ids(bad, merges).collect()

    # null sequence passes through as null; a lone continuation byte
    # (0x80 = id 128) is not valid UTF-8 -> U+FFFD, not a crash
    odd = spark.createDataFrame(
        [Row(doc_id=1, token_ids=None), Row(doc_id=2, token_ids=[128])],
        "doc_id long, token_ids array<int>",
    )
    out = {r["doc_id"]: r["text"] for r in bpe_decode_ids(odd, merges).collect()}
    assert out[1] is None and out[2] == "�"


def test_special_tokens_eos_roundtrip(spark):
    """append_eos closes every doc with <|endoftext|> at id
    256+n_merges (GPT-2's last-vocab-id convention); bpe_vocab's
    special_tokens layout matches; decode with the same special set
    round-trips text + the literal marker; char mode rejected."""
    from vinum_spark.operators.text import (
        GPT2ISH_SPLIT_PATTERN,
        bpe_decode_ids,
        bpe_tokenize_map_side,
        bpe_vocab,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "hello  world"), (2, "")], "doc_id long, text string"
    )
    kw = {"byte_level": True, "token_pattern": GPT2ISH_SPLIT_PATTERN}
    merges = learn_bpe_merges(docs, n_merges=4, **kw)
    n_merges = merges.count()

    voc = {r["token"]: r["token_id"]
           for r in bpe_vocab(merges, special_tokens=("<|endoftext|>",)).collect()}
    assert voc["<|endoftext|>"] == 256 + n_merges
    assert len(voc) == 256 + n_merges + 1

    enc = bpe_tokenize_map_side(
        docs, merges, emit_ids=True, append_eos=True, **kw
    )
    rows = {r["doc_id"]: r for r in enc.collect()}
    assert rows[1]["tokens"][-1] == "<|endoftext|>"
    assert rows[1]["token_ids"][-1] == 256 + n_merges
    assert rows[2]["tokens"] == ["<|endoftext|>"]  # empty doc still closed
    assert rows[1]["n_tokens"] == len(rows[1]["tokens"])

    dec = {
        r["doc_id"]: r["text"]
        for r in bpe_decode_ids(
            enc, merges, special_tokens=("<|endoftext|>",)
        ).collect()
    }
    assert dec[1] == "hello  world<|endoftext|>"
    assert dec[2] == "<|endoftext|>"

    with pytest.raises(ValueError, match="append_eos requires"):
        bpe_tokenize_map_side(docs, merges, append_eos=True)


def test_chunk_token_ids_semantics(spark):
    """Chunk c covers [c*stride, c*stride+max_len); tail fragments kept
    iff >= min_len; empty/null sequences produce no rows; chunk_id is
    dense from 0; validation raises on bad knobs."""
    from vinum_spark.operators.text import chunk_token_ids

    df = spark.createDataFrame(
        [(1, list(range(10))), (2, [7]), (3, []), (4, None)],
        "doc_id long, token_ids array<int>",
    )
    got = sorted(
        (r["doc_id"], r["chunk_id"], tuple(r["token_ids"]), r["n_tokens"])
        for r in chunk_token_ids(df, max_len=4).collect()
    )
    assert got == [
        (1, 0, (0, 1, 2, 3), 4),
        (1, 1, (4, 5, 6, 7), 4),
        (1, 2, (8, 9), 2),
        (2, 0, (7,), 1),
    ]
    # overlap: stride < max_len
    ov = sorted(
        (r["chunk_id"], tuple(r["token_ids"]))
        for r in chunk_token_ids(
            df.filter("doc_id = 1"), 4, stride=2
        ).collect()
    )
    assert ov == [
        (0, (0, 1, 2, 3)),
        (1, (2, 3, 4, 5)),
        (2, (4, 5, 6, 7)),
        (3, (6, 7, 8, 9)),
        (4, (8, 9)),
    ]
    assert (
        chunk_token_ids(df.filter("doc_id = 1"), 4, stride=2, min_len=4).count()
        == 4
    )
    for kw in ({"max_len": 0}, {"max_len": 4, "stride": 0},
               {"max_len": 4, "min_len": 5}):
        with pytest.raises(ValueError):
            chunk_token_ids(df, **kw)


def test_prepare_corpus_chunking_stage(spark):
    """chunk_max_len adds chunking as the pipeline's final stage:
    per-chunk rows carry every pipeline column (shard survives), the
    chunks equal applying the standalone operator to the unchunked
    pipeline, and the stage stays a projection (no extra shuffle
    beyond the stages that declare one)."""
    from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus
    from vinum_spark.operators.text import chunk_token_ids, learn_bpe_merges

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = {"byte_level": True, "token_pattern": "[^ ]+"}
    merges = learn_bpe_merges(docs, n_merges=8, **kw)
    base_cfg = CorpusConfig(
        quality_filter=True, dedup=True, n_shards=4,
        tokenize_with=merges, tokenize_byte_level=True,
        tokenize_pattern="[^ ]+",
    )
    chunk_cfg = CorpusConfig(
        quality_filter=True, dedup=True, n_shards=4,
        tokenize_with=merges, tokenize_byte_level=True,
        tokenize_pattern="[^ ]+",
        chunk_max_len=16, chunk_stride=12, chunk_min_len=4,
    )
    got = prepare_corpus(docs, chunk_cfg)
    assert {"shard", "chunk_id", "token_ids", "n_tokens"} <= set(got.columns)
    assert "tokens" not in got.columns
    want = chunk_token_ids(
        prepare_corpus(docs, base_cfg).drop("tokens", "n_tokens"),
        16, stride=12, min_len=4, preserve=True,
    )
    g = {(r["doc_id"], r["chunk_id"]): (r["token_ids"], r["shard"])
         for r in got.collect()}
    w = {(r["doc_id"], r["chunk_id"]): (r["token_ids"], r["shard"])
         for r in want.collect()}
    assert g == w and len(g) > 0

    import pytest as _pt

    with _pt.raises(ValueError, match="tokenize_emit_ids"):
        prepare_corpus(
            docs,
            CorpusConfig(
                tokenize_with=merges, tokenize_byte_level=True,
                tokenize_pattern="[^ ]+", tokenize_emit_ids=False,
                chunk_max_len=16,
            ),
        )
    with _pt.raises(ValueError, match="tokenize_with"):
        prepare_corpus(docs, CorpusConfig(chunk_max_len=16))


def test_pack_token_blocks_semantics(spark):
    """Independent-expectation pin: blocks equal concatenating each
    shard's docs in (md5 rank, key) order and slicing into
    block_size pieces — recomputed in plain Python with hashlib;
    partition-invariant; drop_last=False keeps tails; empty id
    sequences shift nothing."""
    import hashlib

    from vinum_spark.operators.sampling import pack_token_blocks

    # doc 98 has a NULL id sequence: size(NULL) is -1 under non-ANSI
    # mode, which (pre round-14 review fix) silently shifted every
    # later offset in its shard — it must contribute exactly nothing
    df = spark.createDataFrame(
        [(i, list(range(i * 100, i * 100 + 7))) for i in range(20)]
        + [(99, []), (98, None)],
        "doc_id long, token_ids array<int>",
    )

    def rk(k):
        return hashlib.md5(f"{k}\x1f0".encode()).hexdigest()

    streams = {0: [], 1: []}
    for k in sorted(range(20), key=lambda k: (rk(k), k)):
        streams[int(rk(k)[:8], 16) % 2].extend(range(k * 100, k * 100 + 7))
    want_full = sorted(
        (s, b, tuple(toks[b * 10 : (b + 1) * 10]))
        for s, toks in streams.items()
        for b in range(len(toks) // 10)
    )
    got = sorted(
        (r["shard"], r["block_id"], tuple(r["token_ids"]))
        for r in pack_token_blocks(df, 10, n_shards=2).collect()
    )
    assert got == want_full
    again = sorted(
        (r["shard"], r["block_id"], tuple(r["token_ids"]))
        for r in pack_token_blocks(df.repartition(13), 10, n_shards=2).collect()
    )
    assert again == got
    tails = sorted(
        (r["shard"], r["block_id"], tuple(r["token_ids"]), r["n_tokens"])
        for r in pack_token_blocks(
            df, 10, n_shards=2, drop_last=False
        ).collect()
    )
    want_tails = sorted(
        (s, b, tuple(toks[b * 10 : (b + 1) * 10]),
         len(toks[b * 10 : (b + 1) * 10]))
        for s, toks in streams.items()
        for b in range(-(-len(toks) // 10))
    )
    assert tails == want_tails
    with pytest.raises(ValueError, match="block_size"):
        pack_token_blocks(df, 0)


def test_chunk_preserve_rejects_output_name_collision(spark):
    from vinum_spark.operators.text import chunk_token_ids

    df = spark.createDataFrame(
        [(1, [1, 2, 3], [9])], "doc_id long, ids array<int>, token_ids array<int>"
    )
    with pytest.raises(ValueError, match="token_ids"):
        chunk_token_ids(df, 2, ids_col="ids", preserve=True)


def test_save_load_tokenizer_roundtrip(spark, tmp_path):
    """The JSON artifact round-trips exactly: the reloaded table
    tokenizes byte-for-byte identically (incl. non-ASCII merges),
    config keys survive, bad formats and gappy ranks fail loudly."""
    from vinum_spark.operators.text import (
        GPT2ISH_SPLIT_PATTERN,
        bpe_tokenize_map_side,
        learn_bpe_merges,
        load_tokenizer,
        save_tokenizer,
    )

    docs = spark.createDataFrame(
        [(1, "naïve café 数据 naïve café"), (2, "a  b don't")],
        "doc_id long, text string",
    )
    kw = {"byte_level": True, "token_pattern": GPT2ISH_SPLIT_PATTERN}
    merges = learn_bpe_merges(docs, n_merges=6, **kw)
    path = str(tmp_path / "tok.json")
    save_tokenizer(
        merges, path, byte_level=True,
        token_pattern=GPT2ISH_SPLIT_PATTERN,
        special_tokens=("<|endoftext|>",),
    )
    loaded = load_tokenizer(spark, path)
    assert loaded["byte_level"] is True
    assert loaded["token_pattern"] == GPT2ISH_SPLIT_PATTERN
    assert loaded["special_tokens"] == ("<|endoftext|>",)
    assert [tuple(r) for r in loaded["merges"].orderBy("merge_rank").collect()] == [
        tuple(r) for r in merges.orderBy("merge_rank").collect()
    ]
    a = bpe_tokenize_map_side(docs, merges, emit_ids=True, **kw)
    b = bpe_tokenize_map_side(docs, loaded["merges"], emit_ids=True, **kw)
    assert {tuple(map(str, r)) for r in a.collect()} == {
        tuple(map(str, r)) for r in b.collect()
    }

    (tmp_path / "bad.json").write_text('{"format": "other"}')
    with pytest.raises(ValueError, match="not a vinum_spark-bpe-v1"):
        load_tokenizer(spark, str(tmp_path / "bad.json"))
    gappy = spark.createDataFrame(
        [(1, "a", "b", 3), (3, "ab", "c", 1)],
        "merge_rank int, lhs string, rhs string, pair_count long",
    )
    with pytest.raises(ValueError, match="contiguous"):
        save_tokenizer(gappy, str(tmp_path / "g.json"))


def test_gpt2_published_alphabet_layout():
    """The published GPT-2 byte alphabet and base-id layout, pinned
    against its publicly-known facts: 188 printable bytes map to
    themselves (ids 0-187 in byte order), the 68 others remap to
    consecutive codepoints from U+0100 (ids 188-255 in byte order) —
    so space is 'Ġ' with id 220, newline is 'Ċ', '!' is id 0."""
    from vinum_spark.operators.text import (
        _gpt2_byte_alphabet,
        _gpt2_published_byte_ids,
    )

    b2u, u2b = _gpt2_byte_alphabet()
    ids = _gpt2_published_byte_ids()
    assert b2u[0x20] == "Ġ" and ids[0x20] == 220  # Ġ
    assert b2u[0x0A] == "Ċ"  # Ċ
    assert b2u[0x21] == "!" and ids[0x21] == 0
    assert b2u[0x00] == "Ā" and ids[0x00] == 188
    assert ids[0x7E] == 93 and ids[0xA1] == 94
    assert sorted(ids.values()) == list(range(256))
    assert len(set(b2u.values())) == 256
    assert {u2b[c] for c in b2u.values()} == set(range(256))


def test_save_load_tokenizer_gpt2_published_pair(spark, tmp_path):
    """The published vocab.json/merges.txt pair round-trips: reloaded
    merges are identical, '<|endoftext|>' is classified special (it is
    alphabet-composed, so classification must be by base/product
    membership, not characters), encode under the loaded PUBLISHED ids
    remaps exactly the base bytes, and decode round-trips the text."""
    from vinum_spark.operators.text import (
        GPT2ISH_SPLIT_PATTERN,
        _gpt2_published_byte_ids,
        bpe_decode_ids,
        bpe_encode_ids,
        bpe_tokenize,
        learn_bpe_merges,
        load_tokenizer_gpt2,
        save_tokenizer_gpt2,
    )

    docs = spark.createDataFrame(
        [(1, "naïve café 数据 naïve café"), (2, "a  b don't don't")],
        "doc_id long, text string",
    )
    kw = {"byte_level": True, "token_pattern": GPT2ISH_SPLIT_PATTERN}
    merges = learn_bpe_merges(docs, n_merges=6, **kw)
    mp, vp = str(tmp_path / "merges.txt"), str(tmp_path / "vocab.json")
    save_tokenizer_gpt2(merges, mp, vp)
    assert open(mp).readline() == "#version: 0.2\n"
    loaded = load_tokenizer_gpt2(spark, mp, vp)
    assert loaded["byte_level"] is True and loaded["token_pattern"] is None
    assert loaded["special_tokens"] == ("<|endoftext|>",)
    assert [
        (r["merge_rank"], r["lhs"], r["rhs"])
        for r in loaded["merges"].orderBy("merge_rank").collect()
    ] == [
        (r["merge_rank"], r["lhs"], r["rhs"])
        for r in merges.orderBy("merge_rank").collect()
    ]

    toks = bpe_tokenize(docs, merges, id_col="doc_id", **kw)
    pub = {
        r["doc_id"]: r["token_ids"]
        for r in bpe_encode_ids(
            toks, loaded["merges"], vocab_df=loaded["vocab"]
        ).collect()
    }
    internal = {
        r["doc_id"]: r["token_ids"]
        for r in bpe_encode_ids(toks, merges).collect()
    }
    bid = _gpt2_published_byte_ids()
    for k, seq in internal.items():
        assert pub[k] == [bid[i] if i < 256 else i for i in seq]
    dec = bpe_decode_ids(
        bpe_encode_ids(toks, loaded["merges"], vocab_df=loaded["vocab"]),
        loaded["merges"],
        vocab_df=loaded["vocab"],
    )
    assert {r["doc_id"]: r["text"] for r in dec.collect()} == {
        r["doc_id"]: r["text"] for r in docs.collect()
    }


def test_load_tokenizer_gpt2_rejects_malformed_inputs(spark, tmp_path):
    """Every quiet-mis-tokenization path fails loudly: a merge line
    with the wrong field count, a character outside the published
    alphabet, a vocab missing a single-byte token, a vocab that does
    not id a merge product, and a vocab_df that under-covers the merge
    table at encode time."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from vinum_spark.operators.text import (
        bpe_encode_ids,
        load_tokenizer_gpt2,
        save_tokenizer_gpt2,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "aa ab aa ab aa")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(
        docs, n_merges=2, byte_level=True, token_pattern="[^ ]+"
    )
    mp, vp = str(tmp_path / "m.txt"), str(tmp_path / "v.json")
    save_tokenizer_gpt2(merges, mp, vp)

    bad = tmp_path / "bad.txt"
    bad.write_text("#version: 0.2\na b c\n")
    with pytest.raises(ValueError, match="expected 'lhs rhs'"):
        load_tokenizer_gpt2(spark, str(bad))
    bad.write_text("#version: 0.2\na 　\n")  # U+3000 not in alphabet
    with pytest.raises(ValueError, match="outside the published"):
        load_tokenizer_gpt2(spark, str(bad))

    vocab = json.load(open(vp))
    gone_base = {k: v for k, v in vocab.items() if k != "!"}
    (tmp_path / "nb.json").write_text(json.dumps(gone_base))
    with pytest.raises(ValueError, match="missing the single-byte"):
        load_tokenizer_gpt2(spark, mp, str(tmp_path / "nb.json"))
    gone_merge = {k: v for k, v in vocab.items() if k != "aa"}
    (tmp_path / "nm.json").write_text(json.dumps(gone_merge))
    with pytest.raises(ValueError, match="does not id the merge"):
        load_tokenizer_gpt2(spark, mp, str(tmp_path / "nm.json"))

    # encode-time coverage guard: a vocab_df missing a merge product
    loaded = load_tokenizer_gpt2(spark, mp, vp)
    toks = spark.createDataFrame(
        [(1, ["šš"])], "doc_id long, tokens array<string>"
    )
    undercover = loaded["vocab"].filter(F.length("token") < 2)
    with pytest.raises(ValueError, match="does not cover"):
        bpe_encode_ids(toks, loaded["merges"], vocab_df=undercover)


def test_map_side_published_ids_match_encode_ids(spark, tmp_path):
    """bpe_tokenize_map_side(vocab_df=...) — the streaming path to
    PUBLISHED ids — must emit exactly bpe_encode_ids' sequences under
    the same loaded vocab, and the whole pipeline (batch and stream
    twins share _tokenize_stage) lands published ids through
    CorpusConfig.tokenize_vocab. Under-coverage fails loudly."""
    import pytest

    from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus
    from vinum_spark.operators.text import (
        GPT2ISH_SPLIT_PATTERN,
        bpe_encode_ids,
        bpe_tokenize,
        bpe_tokenize_map_side,
        learn_bpe_merges,
        load_tokenizer_gpt2,
        save_tokenizer_gpt2,
    )

    docs = spark.createDataFrame(
        [(1, "pack my box pack my box"), (2, "naïve café 数据")],
        "doc_id long, text string",
    )
    kw = {"byte_level": True, "token_pattern": GPT2ISH_SPLIT_PATTERN}
    merges = learn_bpe_merges(docs, n_merges=5, **kw)
    mp, vp = str(tmp_path / "m.txt"), str(tmp_path / "v.json")
    save_tokenizer_gpt2(merges, mp, vp)
    loaded = load_tokenizer_gpt2(spark, mp, vp)

    ms = bpe_tokenize_map_side(
        docs, loaded["merges"], emit_ids=True, vocab_df=loaded["vocab"], **kw
    )
    enc = bpe_encode_ids(
        bpe_tokenize(docs, loaded["merges"], id_col="doc_id", **kw),
        loaded["merges"],
        vocab_df=loaded["vocab"],
    )
    assert {r["doc_id"]: r["token_ids"] for r in ms.collect()} == {
        r["doc_id"]: r["token_ids"] for r in enc.collect()
    }

    piped = prepare_corpus(
        docs,
        CorpusConfig(
            quality_filter=False,
            dedup=False,
            tokenize_with=loaded["merges"],
            tokenize_byte_level=True,
            tokenize_pattern=GPT2ISH_SPLIT_PATTERN,
            tokenize_emit_ids=True,
            tokenize_vocab=loaded["vocab"],
        ),
    )
    assert {r["doc_id"]: r["token_ids"] for r in piped.collect()} == {
        r["doc_id"]: r["token_ids"] for r in enc.collect()
    }

    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="does not cover"):
        bpe_tokenize_map_side(
            docs,
            loaded["merges"],
            emit_ids=True,
            vocab_df=loaded["vocab"].filter(F.length("token") < 2),
            **kw,
        )
    with pytest.raises(ValueError, match="emit_ids"):
        bpe_tokenize_map_side(
            docs, loaded["merges"], vocab_df=loaded["vocab"], **kw
        )


def test_encode_ids_vocab_guard_and_special_decode_flag(spark, tmp_path):
    """Two review regressions: (1) bpe_encode_ids' vocab_df coverage
    check only sees merge-emittable tokens, so a token outside that
    range (an appended eos the vocab lacks) must fail at RUNTIME, not
    silently shorten the sequence; (2) bpe_decode_ids must classify
    specials by the loader's explicit is_special flag — a special
    whose literal name is byte-symbol-composed would fool a character
    heuristic into decoding it as raw bytes."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from vinum_spark.operators.text import (
        bpe_decode_ids,
        bpe_encode_ids,
        learn_bpe_merges,
        load_tokenizer_gpt2,
        save_tokenizer_gpt2,
    )

    docs = spark.createDataFrame(
        [(1, "aa ab aa ab aa")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(
        docs, n_merges=2, byte_level=True, token_pattern="[^ ]+"
    )
    mp, vp = str(tmp_path / "m.txt"), str(tmp_path / "v.json")
    save_tokenizer_gpt2(merges, mp, vp, special_tokens=())  # NO eos in vocab
    loaded = load_tokenizer_gpt2(spark, mp, vp)

    # (1) tokens carry an eos the vocab does not id: the eager check
    # passes (eos is not merge-emittable), the runtime guard must fire
    # — the text token is in-vocab, so the special alone trips it
    aa = chr(0x100 + ord("a")) * 2
    toks = spark.createDataFrame(
        [(1, [aa, "<|endoftext|>"])], "doc_id long, tokens array<string>"
    )
    bad = bpe_encode_ids(toks, loaded["merges"], vocab_df=loaded["vocab"])
    with pytest.raises(SparkRuntimeException, match="does not id every token"):
        bad.collect()

    # (2) a special literally named with byte-symbol chars (U+0101 =
    # internal symbol of byte 1) must decode to its LITERAL name
    import json

    vocab = json.load(open(vp))
    weird = "āā"
    vocab[weird] = max(vocab.values()) + 1
    (tmp_path / "w.json").write_text(json.dumps(vocab, ensure_ascii=False))
    loaded2 = load_tokenizer_gpt2(spark, mp, str(tmp_path / "w.json"))
    assert weird in loaded2["special_tokens"]
    seq = spark.createDataFrame(
        [(1, [int(vocab[weird])])], "doc_id long, token_ids array<int>"
    )
    dec = bpe_decode_ids(seq, loaded2["merges"], vocab_df=loaded2["vocab"])
    assert dec.collect()[0]["text"] == weird  # literal, not raw bytes


def test_encode_ids_special_tokens_default_layout(spark):
    """The DEFAULT bpe_vocab path has the same silent-shortening trap
    as vocab_df: an appended eos not passed via special_tokens must
    fail at runtime, and passing it must encode at id 256+n_merges."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from vinum_spark.operators.text import bpe_encode_ids, learn_bpe_merges

    docs = spark.createDataFrame(
        [(1, "aa ab aa ab aa")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(
        docs, n_merges=2, byte_level=True, token_pattern="[^ ]+"
    )
    aa = chr(0x100 + ord("a")) * 2  # 'aa' in the internal byte alphabet
    toks = spark.createDataFrame(
        [(1, [aa, "<|endoftext|>"])], "doc_id long, tokens array<string>"
    )
    with pytest.raises(SparkRuntimeException, match="does not id every"):
        bpe_encode_ids(toks, merges).collect()
    good = bpe_encode_ids(
        toks, merges, special_tokens=("<|endoftext|>",)
    ).collect()[0]
    assert good["token_ids"][-1] == 258  # 256 + 2 merges
    assert good["n_tokens"] == len(good["token_ids"]) == 2


def test_save_load_tokenizer_hf_single_file(spark, tmp_path):
    """The single-file HuggingFace tokenizer.json round-trips with
    CROSS-FORMAT id agreement: the same merge table saved as
    tokenizer.json and as the vocab.json/merges.txt pair loads to
    identical merges, identical published ids on a real encode, and
    the same special classification ('<|endoftext|>' listed in
    added_tokens AND idd in model.vocab, like the published GPT-2
    file)."""
    import json

    from vinum_spark.operators.text import (
        GPT2ISH_SPLIT_PATTERN,
        bpe_decode_ids,
        bpe_encode_ids,
        bpe_tokenize,
        learn_bpe_merges,
        load_tokenizer_gpt2,
        load_tokenizer_hf,
        save_tokenizer_gpt2,
        save_tokenizer_hf,
    )

    docs = spark.createDataFrame(
        [(1, "naïve café 数据 naïve café"), (2, "a  b don't don't")],
        "doc_id long, text string",
    )
    kw = {"byte_level": True, "token_pattern": GPT2ISH_SPLIT_PATTERN}
    merges = learn_bpe_merges(docs, n_merges=6, **kw)
    tj = str(tmp_path / "tokenizer.json")
    mp, vp = str(tmp_path / "merges.txt"), str(tmp_path / "vocab.json")
    # the artifact carries its pre-tokenizer: a custom training regex
    # writes the Sequence[Split, ByteLevel] shape and loads back as
    # the same token_pattern
    save_tokenizer_hf(merges, tj, token_pattern=GPT2ISH_SPLIT_PATTERN)
    save_tokenizer_gpt2(merges, mp, vp)

    doc = json.load(open(tj, encoding="utf-8"))
    assert doc["model"]["type"] == "BPE"
    assert doc["pre_tokenizer"]["type"] == "Sequence"
    # the Split stage must be the keep-matches-drop-gaps spelling
    # (Removed + invert=true, the converted-GPT-4-class shape): under
    # the real tokenizers library, Isolated+invert=false would keep
    # non-matching gap text as extra segments and disagree with this
    # repo's regexp_extract_all ids on any gap-bearing input
    sp = doc["pre_tokenizer"]["pretokenizers"][0]
    assert sp["type"] == "Split"
    assert sp["behavior"] == "Removed" and sp["invert"] is True
    assert [t["content"] for t in doc["added_tokens"]] == ["<|endoftext|>"]
    assert doc["added_tokens"][0]["special"] is True
    assert "<|endoftext|>" in doc["model"]["vocab"]

    hf = load_tokenizer_hf(spark, tj)
    pair = load_tokenizer_gpt2(spark, mp, vp)
    assert hf["byte_level"] is True
    assert hf["token_pattern"] == GPT2ISH_SPLIT_PATTERN
    assert hf["special_tokens"] == ("<|endoftext|>",)
    key = lambda df: [  # noqa: E731
        (r["merge_rank"], r["lhs"], r["rhs"])
        for r in df.orderBy("merge_rank").collect()
    ]
    assert key(hf["merges"]) == key(pair["merges"]) == key(merges)
    vkey = lambda df: sorted(  # noqa: E731
        (r["token"], r["token_id"], r["is_special"]) for r in df.collect()
    )
    assert vkey(hf["vocab"]) == vkey(pair["vocab"])

    toks = bpe_tokenize(docs, merges, id_col="doc_id", **kw)
    ids_hf = {
        r["doc_id"]: r["token_ids"]
        for r in bpe_encode_ids(
            toks, hf["merges"], vocab_df=hf["vocab"]
        ).collect()
    }
    ids_pair = {
        r["doc_id"]: r["token_ids"]
        for r in bpe_encode_ids(
            toks, pair["merges"], vocab_df=pair["vocab"]
        ).collect()
    }
    assert ids_hf == ids_pair
    dec = bpe_decode_ids(
        bpe_encode_ids(toks, hf["merges"], vocab_df=hf["vocab"]),
        hf["merges"],
        vocab_df=hf["vocab"],
    )
    assert {r["doc_id"]: r["text"] for r in dec.collect()} == {
        r["doc_id"]: r["text"] for r in docs.collect()
    }


def test_load_tokenizer_hf_accepts_published_shapes(spark, tmp_path):
    """The two byte-level shapes real files ship: merges as
    ["lhs", "rhs"] pairs (tokenizers >=0.20 exports) load identically
    to "lhs rhs" strings, and a Sequence[Split, ByteLevel]
    pre-tokenizer (Llama-3-class) is accepted with its split regex
    surfaced; added special tokens OUTSIDE model.vocab are included
    at their declared ids."""
    import json

    from vinum_spark.operators.text import (
        learn_bpe_merges,
        load_tokenizer_hf,
        save_tokenizer_hf,
    )

    docs = spark.createDataFrame(
        [(1, "aa ab aa ab aa")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(
        docs, n_merges=2, byte_level=True, token_pattern="[^ ]+"
    )
    tj = str(tmp_path / "tokenizer.json")
    save_tokenizer_hf(merges, tj)  # no pattern -> bare ByteLevel
    doc = json.load(open(tj, encoding="utf-8"))
    assert doc["pre_tokenizer"]["type"] == "ByteLevel"

    base = load_tokenizer_hf(spark, tj)
    # bare ByteLevel(use_regex=true) IS the exact GPT-2 split
    from vinum_spark.operators.text import GPT2_EXACT

    assert base["token_pattern"] == GPT2_EXACT
    doc2 = json.loads(json.dumps(doc))
    doc2["model"]["merges"] = [
        m.split(" ") for m in doc2["model"]["merges"]
    ]
    doc2["pre_tokenizer"] = {
        "type": "Sequence",
        "pretokenizers": [
            {"type": "Split", "pattern": {"Regex": "[^ ]+"},
             "behavior": "Isolated", "invert": False},
            {"type": "ByteLevel", "add_prefix_space": False,
             "trim_offsets": True, "use_regex": False},
        ],
    }
    doc2["added_tokens"].append(
        {"id": 999, "content": "<|pad|>", "single_word": False,
         "lstrip": False, "rstrip": False, "normalized": False,
         "special": True}
    )
    tj2 = str(tmp_path / "tokenizer2.json")
    json.dump(doc2, open(tj2, "w", encoding="utf-8"), ensure_ascii=False)
    alt = load_tokenizer_hf(spark, tj2)
    key = lambda df: [  # noqa: E731
        (r["merge_rank"], r["lhs"], r["rhs"])
        for r in df.orderBy("merge_rank").collect()
    ]
    assert key(alt["merges"]) == key(base["merges"])
    assert alt["token_pattern"] == "[^ ]+"
    assert alt["special_tokens"] == ("<|endoftext|>", "<|pad|>")
    pad = [r for r in alt["vocab"].collect() if r["token"] == "<|pad|>"]
    assert pad and pad[0]["token_id"] == 999 and pad[0]["is_special"]


def test_load_tokenizer_hf_split_semantics_and_whitespace(spark, tmp_path):
    """Split behavior/invert fidelity matrix: Removed+invert=true (the
    keep-matches shape save_tokenizer_hf writes, and converted GPT-4
    artifacts ship) and Isolated+invert=false (Llama-3, tiling
    patterns) both load with the regex surfaced; every other
    combination raises naming itself — Removed+invert=false keeps ONLY
    the gaps, MergedWith*/Contiguous re-attach delimiters, none of
    which regexp_extract_all can reproduce. A Whitespace stage maps to
    the documented Java translation of HF's fixed regex. added_tokens
    with special: false (chat-template markers in real artifacts) are
    honored: literal class, declared id."""
    import json

    import pytest

    from vinum_spark.operators.text import (
        HF_WHITESPACE_PATTERN,
        learn_bpe_merges,
        load_tokenizer_hf,
        save_tokenizer_hf,
    )

    docs = spark.createDataFrame(
        [(1, "aa ab aa ab aa")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(
        docs, n_merges=2, byte_level=True, token_pattern="[^ ]+"
    )
    tj = str(tmp_path / "base.json")
    # the save side writes the gap-dropping pattern faithfully even
    # for the non-tiling '[^ ]+' (its gaps are the spaces)
    save_tokenizer_hf(merges, tj, token_pattern="[^ ]+")
    base_doc = json.load(open(tj, encoding="utf-8"))
    sp = base_doc["pre_tokenizer"]["pretokenizers"][0]
    assert (sp["behavior"], sp["invert"]) == ("Removed", True)
    assert load_tokenizer_hf(spark, tj)["token_pattern"] == "[^ ]+"

    def variant(name, **split_fields):
        d = json.loads(json.dumps(base_doc))
        d["pre_tokenizer"]["pretokenizers"][0].update(split_fields)
        p = str(tmp_path / name)
        json.dump(d, open(p, "w", encoding="utf-8"), ensure_ascii=False)
        return p

    # Isolated+invert=false (Llama-3 spelling): accepted, documented
    # tiling assumption
    ok = variant("isolated.json", behavior="Isolated", invert=False)
    assert load_tokenizer_hf(spark, ok)["token_pattern"] == "[^ ]+"
    # gap-keeping / delimiter-reattaching combos: loud refusal
    for name, fields in [
        ("gaps.json", {"behavior": "Removed", "invert": False}),
        ("isoinv.json", {"behavior": "Isolated", "invert": True}),
        ("mprev.json", {"behavior": "MergedWithPrevious", "invert": False}),
        ("contig.json", {"behavior": "Contiguous", "invert": True}),
    ]:
        with pytest.raises(ValueError, match="no regexp_extract_all"):
            load_tokenizer_hf(spark, variant(name, **fields))

    # an HF LITERAL pattern ({"String": ...}) is regex-quoted: a '.'
    # must match itself, not every character
    lit = variant(
        "literal.json",
        pattern={"String": "."},
        behavior="Removed",
        invert=True,
    )
    assert load_tokenizer_hf(spark, lit)["token_pattern"] == "\\Q.\\E"

    # TWO splitting stages (sequential composition) must refuse loudly,
    # not silently keep the last one — including ByteLevel(use_regex=
    # true) after a Split, which is itself a second GPT-2 split
    d2s = json.loads(json.dumps(base_doc))
    d2s["pre_tokenizer"]["pretokenizers"].insert(1, {"type": "Whitespace"})
    p2s = str(tmp_path / "twosplit.json")
    json.dump(d2s, open(p2s, "w", encoding="utf-8"), ensure_ascii=False)
    with pytest.raises(ValueError, match="more than one splitting"):
        load_tokenizer_hf(spark, p2s)
    dbl = json.loads(json.dumps(base_doc))
    dbl["pre_tokenizer"]["pretokenizers"][1]["use_regex"] = True
    pbl = str(tmp_path / "bl_regex.json")
    json.dump(dbl, open(pbl, "w", encoding="utf-8"), ensure_ascii=False)
    with pytest.raises(ValueError, match="more than one splitting"):
        load_tokenizer_hf(spark, pbl)

    # Whitespace stage inside the Sequence -> the documented mapping
    d = json.loads(json.dumps(base_doc))
    d["pre_tokenizer"]["pretokenizers"][0] = {"type": "Whitespace"}
    pw = str(tmp_path / "ws.json")
    json.dump(d, open(pw, "w", encoding="utf-8"), ensure_ascii=False)
    assert (
        load_tokenizer_hf(spark, pw)["token_pattern"]
        == HF_WHITESPACE_PATTERN
    )
    # ...and standalone Whitespace (no ByteLevel) is still refused as
    # non-byte-level, not crashed on
    d2 = json.loads(json.dumps(base_doc))
    d2["pre_tokenizer"] = {"type": "Whitespace"}
    pw2 = str(tmp_path / "ws_only.json")
    json.dump(d2, open(pw2, "w", encoding="utf-8"), ensure_ascii=False)
    with pytest.raises(ValueError, match="not ByteLevel"):
        load_tokenizer_hf(spark, pw2)

    # a special: false added token (HF still extracts it before BPE
    # and decodes it literally) lands in the literal class at its id
    d3 = json.loads(json.dumps(base_doc))
    d3["added_tokens"].append(
        {"id": 777, "content": "<fim_middle>", "single_word": False,
         "lstrip": False, "rstrip": False, "normalized": False,
         "special": False}
    )
    p3 = str(tmp_path / "nonspecial.json")
    json.dump(d3, open(p3, "w", encoding="utf-8"), ensure_ascii=False)
    got = load_tokenizer_hf(spark, p3)
    fim = [r for r in got["vocab"].collect() if r["token"] == "<fim_middle>"]
    assert fim and fim[0]["token_id"] == 777 and fim[0]["is_special"]
    assert "<fim_middle>" in got["special_tokens"]


def test_hf_whitespace_pattern_matches_rust_semantics(spark):
    """HF_WHITESPACE_PATTERN is the Java translation of the Rust regex
    \\w+|[^\\w\\s]+ that HF's Whitespace pre-tokenizer hard-codes —
    pin the translation against hand-derived expectations covering
    each class: letters+marks+digits+connector (word branch),
    punctuation runs (non-word branch), Unicode whitespace dropped,
    ZWJ/ZWNJ in the word branch (Join_Control is in Rust \\w)."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.text import HF_WHITESPACE_PATTERN

    cases = [
        ("hello, wörld!", ["hello", ",", "wörld", "!"]),
        ("a_b\tc\u00a0d", ["a_b", "c", "d"]),  # tab + NBSP both \\s
        ("x1y2 ... 3", ["x1y2", "...", "3"]),
        ("e\u200df g", ["e\u200df", "g"]),  # ZWJ joins the word branch
        ("", []),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i long, t string"
    )
    got = {
        r["i"]: list(r["toks"])
        for r in df.select(
            "i",
            # Column literal, never SQL text: a SQL string literal
            # would eat the pattern's backslashes (the same rule the
            # byte-level tokenizer operators follow)
            F.regexp_extract_all(
                "t", F.lit(HF_WHITESPACE_PATTERN), F.lit(0)
            ).alias("toks"),
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_load_tokenizer_hf_rejects_unsupported_semantics(spark, tmp_path):
    """Every semantics-changing field fails loudly naming itself:
    non-BPE model, BPE-dropout, subword prefix/suffix, byte_fallback,
    and a non-byte-level pre-tokenizer."""
    import json

    import pytest

    from vinum_spark.operators.text import (
        learn_bpe_merges,
        load_tokenizer_hf,
        save_tokenizer_hf,
    )

    docs = spark.createDataFrame(
        [(1, "aa ab aa ab aa")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(
        docs, n_merges=2, byte_level=True, token_pattern="[^ ]+"
    )
    tj = str(tmp_path / "tokenizer.json")
    save_tokenizer_hf(merges, tj)
    doc = json.load(open(tj, encoding="utf-8"))

    def variant(**patch):
        d = json.loads(json.dumps(doc))
        for k, v in patch.items():
            if k == "pre_tokenizer":
                d["pre_tokenizer"] = v
            else:
                d["model"][k] = v
        p = str(tmp_path / "bad.json")
        json.dump(d, open(p, "w", encoding="utf-8"), ensure_ascii=False)
        return p

    for patch, msg in (
        ({"type": "WordPiece"}, "model.type"),
        ({"dropout": 0.1}, "dropout"),
        ({"continuing_subword_prefix": "##"}, "continuing_subword_prefix"),
        ({"end_of_word_suffix": "</w>"}, "end_of_word_suffix"),
        ({"byte_fallback": True}, "byte_fallback"),
        ({"pre_tokenizer": {"type": "Whitespace"}}, "byte-level"),
        ({"pre_tokenizer": None}, "byte-level"),
    ):
        with pytest.raises(ValueError, match=msg):
            load_tokenizer_hf(spark, variant(**patch))


def test_published_savers_reject_colliding_merge_products(spark, tmp_path):
    """Two merges concatenating to one string (('a','bc') and
    ('ab','c') both yield 'abc') cannot share a flat published vocab:
    BOTH published savers raise at save time instead of silently
    overwriting the earlier id (which the loaders' product check would
    not catch — the string IS idd, just once)."""
    import pytest

    from vinum_spark.operators.text import (
        save_tokenizer_gpt2,
        save_tokenizer_hf,
    )

    def sym(s):
        return "".join(chr(0x100 + ord(c)) for c in s)

    merges = spark.createDataFrame(
        [
            (1, sym("a"), sym("b"), 9),
            (2, sym("ab"), sym("c"), 8),
            (3, sym("b"), sym("c"), 7),
            (4, sym("a"), sym("bc"), 6),  # 'abc' again
        ],
        "merge_rank int, lhs string, rhs string, pair_count long",
    )
    with pytest.raises(ValueError, match="concatenates to"):
        save_tokenizer_gpt2(merges, str(tmp_path / "m.txt"))
    with pytest.raises(ValueError, match="concatenates to"):
        save_tokenizer_hf(merges, str(tmp_path / "t.json"))


def test_hf_tokenizer_json_ids_match_real_tokenizers_lib(spark, tmp_path):
    """Executable cross-check of the q106 artifact against the REAL
    HuggingFace ``tokenizers`` library: save -> load with the real lib
    -> encode -> ids must equal bpe_encode_ids on the same corpus, for
    both the bare-ByteLevel (GPT-2 exact) artifact and the custom
    Sequence[Split(Removed, invert=true), ByteLevel] shape. Skipped
    with reason when the library is absent (it is not in this
    container and installs are unavailable) — the test self-arms the
    moment an environment provides it."""
    import pytest

    tokenizers = pytest.importorskip(
        "tokenizers",
        reason="HuggingFace 'tokenizers' not installed in this container "
        "(no network installs); artifact fidelity is argued from the "
        "format spec in save_tokenizer_hf and pinned structurally in "
        "the neighboring tests",
    )

    from vinum_spark.operators.text import (
        GPT2_EXACT,
        GPT2ISH_SPLIT_PATTERN,
        bpe_encode_ids,
        bpe_tokenize,
        learn_bpe_merges,
        save_tokenizer_hf,
    )

    corpus = [
        (1, "naïve café 数据 naïve café"),
        (2, "a  b don't don't  trailing  "),
        (3, "low lower lowest low low"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")

    for pattern, name in (
        (GPT2_EXACT, "gpt2_exact"),
        (GPT2ISH_SPLIT_PATTERN, "custom_split"),
        ("[^ ]+", "gap_bearing"),
    ):
        merges = learn_bpe_merges(
            docs, n_merges=8, byte_level=True, token_pattern=pattern
        )
        tj = str(tmp_path / f"tok_{name}.json")
        save_tokenizer_hf(
            merges, tj,
            token_pattern=None if pattern == GPT2_EXACT else pattern,
        )
        real = tokenizers.Tokenizer.from_file(tj)
        toks = bpe_tokenize(
            docs, merges, id_col="doc_id", byte_level=True,
            token_pattern=pattern,
        )
        ours = {
            r["doc_id"]: list(r["token_ids"])
            for r in bpe_encode_ids(toks, merges).collect()
        }
        for doc_id, text in corpus:
            theirs = real.encode(text).ids
            assert ours[doc_id] == theirs, (
                f"{name}: id divergence on doc {doc_id}: "
                f"{ours[doc_id]} vs {theirs}"
            )


def test_driver_sym_list_matches_spark_expression(spark):
    """The local BPE fast path now builds symbol lists driver-side
    (round 19: the collect ships only (word, freq) via Arrow); the
    driver construction must equal the Spark ``sym`` expression on both
    alphabets, including multi-byte UTF-8 and uppercase."""
    from pyspark.sql import functions as F

    from vinum_spark.operators.text import _byte_sym_sql, _driver_sym_list

    words = ["hello", "héllo", "Ω→π", "a b".replace(" ", ""), "x", "日本語"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    byte_rows = {
        r["word"]: list(r["sym"])
        for r in df.withColumn("sym", F.expr(_byte_sym_sql("word"))).collect()
    }
    char_rows = {
        r["word"]: list(r["sym"])
        for r in df.withColumn("sym", F.split("word", "")).collect()
    }
    for w in words:
        assert _driver_sym_list(w, byte_level=True) == byte_rows[w], w
        assert _driver_sym_list(w, byte_level=False) == char_rows[w], w
