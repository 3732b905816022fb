"""Driver-style oracle gates for the queries whose parity depends on
deliberate gate DESIGN rather than plain SQL translation: engine-
specific machinery made self-verifying (LSH buckets, SimHash bands,
HLL, hyperplane/IVF ANN — recall/agreement gates) plus the paths with
cross-engine representation traps (streaming sliding windows: epoch
flooring; multimodal metadata: blob-hash portability). These tests run
the SAME DuckDB oracle the round driver runs, at sf0.001 (the driver
gates at sf0.01 — both verified)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from vinum_spark.inventory import QUERIES, oracle_sql

SF_DIR = "/root/testdata/sf0.001"

_GATED_RAW = [
    "q29_minhash_lsh_dedup",
    "q30_simhash",
    "q32_ann_lsh",
    "q38_approx_distinct",
    "q46_ann_ivf",
    "q51_streaming_sliding",
    "q52_multimodal_metadata",
    "q53_streaming_stateful_dedup",
    "q54_winnowing_pairs",
    "q56_embedding_lsh_verify",
    # round-7 additions with cross-engine representation traps: lambda
    # HOF + regex parity (q58), md5-threshold sample membership (q59),
    # tokenizer-split parity (q60), RE2-subset redaction bytes (q61)
    "q55_stream_interval_join",
    "q57_skew_salted_agg",
    "q58_quality_rules",
    "q59_stratified_sample",
    "q60_length_buckets",
    "q61_pii_redaction",
    "q62_deterministic_shard",
    "q63_dedup_clusters",
    "q64_repetition_signals",
    "q65_pipeline_compose",
    "q66_group_topn_sample",
    "q67_vocab_topk",
    # round-7 continuation: decontamination / boilerplate / LM-score /
    # packing / incremental-dedup / BM25 — cross-engine traps are the
    # shared md5 rank (q71/q72), regex token split parity (q68/q69/q73),
    # and float rounding of log means (q70)
    "q68_decontamination",
    "q69_boilerplate_removal",
    "q70_lm_quality_score",
    "q71_pack_sequences",
    "q72_incremental_dedup",
    "q73_bm25_search",
    "q74_mixture_sample",
    "q75_prepare_corpus",
    "q76_encode_tokens",
    "q77_ann_pq",
    "q78_knn_join",
    # round-9: the composed IVF-PQ path (components gated by q46/q77)
    "q79_ann_ivfpq",
    # round-9: media-probe closed-form gate (FLAC/WAV/MP3 walks)
    "q80_media_probe",
    # round-10: real-sample-decode closed-form gate (verbatim FLAC /
    # IMA ADPCM / G.711 mu-law built in-query, decode_audio parity)
    "q81_audio_decode",
    # round-11: Vorbis sample-decode closed-form gate (full Ogg stream
    # built in-query by the inline encoder, decode_audio parity)
    "q84_vorbis_decode",
    # round-11: audio near-dup chain (decode -> RMS envelope -> LSH ->
    # verify over planted twins; the q83 image chain's audio analogue)
    "q85_audio_neardup",
    # round-13: q86-q89 rotated into the driver window, but their gates
    # are engine-designed (AQE skew pins, banded hamming LSH, greedy
    # merge parity) so the in-suite oracle run stays
    "q86_skew_join_aqe",
    "q87_image_phash_neardup",
    "q88_bpe_merges",
    "q89_bpe_tokenize",
    # round-13 additions (byte-level BPE training/tokenization, the
    # composed tokenizer pipeline, token-id encoding) — rotated into
    # the driver window in the round-13 second rotation; the in-suite
    # oracle run stays
    "q90_bpe_byte_merges",
    "q91_bpe_byte_tokenize",
    "q92_tokenizer_pipeline",
    "q93_bpe_token_ids",
    # round-13 third wave: byte-level training under the production
    # (RE2-safe GPT-2) pre-tokenizer — sits first in the tail until a
    # future rotation
    "q94_bpe_gpt2_pretokenize",
    # round-13 fourth wave: the tokenizing prepare_corpus chain (q75's
    # survivor pipeline + byte merge chain + id mapping) as one gate
    "q95_pipeline_tokenized",
    # the demoted tail (every query outside inventory._GATE_HEAD):
    # outside the round driver's 50-row record, so their EXACT driver
    # oracles run here — no query is ever both driver-invisible and
    # suite-invisible
    "q20_set_ops",
    "q44_dedup_exact_survivors",
    "q45_table_sql_pipeline",
    "q02_filter_project",
    "q03_global_agg",
    "q05_distinct",
    "q06_having",
    "q07_orderby_limit_offset",
    "q08_math_functions",
    "q09_string_functions",
    "q10_datetime",
    "q15_anti_join",
    "q19_window_running",
    "q36_cube",
    "q47_grouping_sets",
    "q11_case_when",
    "q12_conditional_agg",
    "q16_semi_join",
    "q35_percentiles",
    "q41_null_semantics",
    "q42_regex_strings",
    "q48_grouped_agg_udf",
    "q37_pivot",
    "q24_events_sessionize",
    "q26_lang_id",
    "q32_ann_lsh",
    "q30_simhash",
    # round-10 rotation: demoted so q79/q80 get driver-recorded greens;
    # their exact driver oracles run here instead
    "q31_cosine_topk",
    "q23_events_tumbling_window",
    "q83_image_neardup",
    # round-11 rotation: demoted so q84 gets a driver-recorded green;
    # its exact driver oracle runs here instead
    "q52_multimodal_metadata",
    # round-13 rotation: demoted so q86-q89 get driver-recorded greens;
    # their exact driver oracles run here instead (q24 already above)
    "q34_json_extract",
    "q17_scalar_subquery",
    "q49_streaming_tumbling",
    # round-13 second rotation: demoted so q90-q93 get driver rows
    # this round; exact driver oracles run here instead
    "q39_embedding_neardup_pairs",
    # round-13 third rotation: demoted so q94/q95 get driver rows too
    # (q64's signal machinery pinned by gated q58/q70; q76's vocab-id
    # mapping by gated q93/q67); exact driver oracles run here instead
    "q64_repetition_signals",
    "q76_encode_tokens",
    # round-14 rotation: stepped out of the driver head (see
    # inventory._GATE_HEAD) so the core-SQL family + q96-q99 step in;
    # exact driver oracles run here instead
    "q22_count_distinct",
    "q27_dedup_exact",
    "q50_streaming_session",
    # round-14 additions outside the 50-head: the tokenizer round-trip
    # identity (decode(encode(text)) == text under the tiling GPT-2
    # pattern) and context-window chunking run here until a future
    # rotation
    "q100_bpe_roundtrip",
    "q101_chunk_token_ids",
    # round-14 gap-fill: these four tail members relied on OTHER tests
    # covering their machinery but never ran their exact driver oracle
    # in this suite — found by the structural invariant test below
    "q25_text_stats",
    "q28_ngram_jaccard",
    "q40_vectorized_udf",
    "q43_token_explode",
]

# entries may appear under several rationale comments (engine-designed
# gate AND demoted-tail); run each exactly once
GATED = list(dict.fromkeys(_GATED_RAW))


@pytest.fixture(scope="module")
def oracle_con():
    from vinum_spark.inventory import TABLES

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", GATED)
def test_gate_matches_duckdb_oracle(spark, oracle_con, name):
    sdf = QUERIES[name].fn(spark, SF_DIR).toPandas()
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


def test_every_query_has_an_oracle():
    """Round-3 contract: zero rows-only checks left in the inventory."""
    missing = [n for n in QUERIES if n not in oracle_sql()]
    assert missing == []


def test_every_non_gate_query_runs_its_oracle_in_suite():
    """Structural invariant behind the gate rotation: the round driver
    records only inventory._GATE_HEAD, so EVERY other query's exact
    driver oracle must run here (GATED) — no query is ever both
    driver-invisible and suite-invisible."""
    from vinum_spark.inventory import _GATE_HEAD

    outside = set(QUERIES) - set(_GATE_HEAD)
    uncovered = sorted(outside - set(GATED))
    assert uncovered == []
