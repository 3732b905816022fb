"""Large-scale data-pipeline operators — the north-star extensions beyond
the reference surface (reference has no joins/windows/dedup:
``/root/reference/vinum/api/table.py:213-218``).

Every operator is a DataFrame → DataFrame transformer built from JVM-side
built-ins wherever Spark can express the semantics; Python (Arrow-batched
pandas UDF) appears only where it genuinely cannot (SimHash bit packing,
multimodal decode). That makes each operator partition-parallel by
construction — the 100 TB design requirement.
"""

from vinum_spark.operators.text import (
    bm25_topk,
    encode_tokens,
    lm_quality_score,
    normalize_text,
    remove_boilerplate,
    strip_html,
    with_token_count,
    with_text_stats,
    with_lang_id,
    with_fingerprint,
    with_quality_rules,
    with_pii_redacted,
    repetition_stats,
    vocab_topk,
    winnowing_fingerprints,
    winnowing_shared_pairs,
)
from vinum_spark.operators.sampling import (
    deterministic_sample,
    mixture_sample,
    pack_sequences,
    stratified_sample,
    group_sample_topn,
    length_bucket_stats,
    with_shard,
    export_shards,
)
from vinum_spark.operators.dedup import (
    contaminated_docs,
    dedup_against_store,
    dedup_exact,
    minhash_signatures,
    minhash_candidate_pairs,
    minhash_lsh_dedup,
    minhash_verified_dedup,
    simhash,
    simhash_candidate_pairs,
    simhash_dedup,
    ngram_jaccard_pairs,
    ngram_jaccard_verify,
    connected_components,
    dedup_clusters,
)
from vinum_spark.operators.similarity import (
    with_cosine_similarity,
    cosine_topk,
    lsh_signature,
    lsh_bucket_topk,
    lsh_candidate_pairs,
    cosine_verify,
    blocked_pair_cosine,
    ivf_index,
    ivf_topk,
)
from vinum_spark.operators.asof import asof_join
from vinum_spark.operators.pipeline import CorpusConfig, prepare_corpus
from vinum_spark.operators.multimodal import (
    attach_metadata,
    decode_images,
    decode_audio,
    resize_images,
    probe_media,
    extract_features,
    sample_frames,
)
from vinum_spark.operators.skew import salted_count, salted_sum, salted_join

__all__ = [
    "with_token_count",
    "with_text_stats",
    "with_lang_id",
    "with_fingerprint",
    "with_quality_rules",
    "with_pii_redacted",
    "repetition_stats",
    "vocab_topk",
    "deterministic_sample",
    "stratified_sample",
    "group_sample_topn",
    "length_bucket_stats",
    "with_shard",
    "export_shards",
    "winnowing_fingerprints",
    "winnowing_shared_pairs",
    "dedup_exact",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "minhash_lsh_dedup",
    "minhash_verified_dedup",
    "simhash",
    "simhash_candidate_pairs",
    "simhash_dedup",
    "ngram_jaccard_pairs",
    "ngram_jaccard_verify",
    "connected_components",
    "dedup_clusters",
    "with_cosine_similarity",
    "cosine_topk",
    "lsh_signature",
    "lsh_bucket_topk",
    "lsh_candidate_pairs",
    "cosine_verify",
    "blocked_pair_cosine",
    "ivf_index",
    "ivf_topk",
    "asof_join",
    "attach_metadata",
    "decode_images",
    "decode_audio",
    "resize_images",
    "probe_media",
    "extract_features",
    "sample_frames",
    "salted_count",
    "salted_sum",
    "salted_join",
]
