"""One-call corpus preparation — the composed pipeline a training-data
user actually runs, built entirely from the individually-gated
operators (each stage's semantics are pinned by its own DuckDB oracle;
q65 pins a four-stage composition end-to-end).

Every stage is a lazy DataFrame transform, so Catalyst fuses the
map-side stages (clean → normalize → quality flags → decontamination
probe are one scan-project-filter pipeline before the first shuffle)
and the whole chain stays partition-parallel: the shuffles are exactly
the ones the enabled stages individually declare (fingerprint for
dedup, segment/doc keys for boilerplate, stratum for mixing, shard for
packing) — composition adds none.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vinum_spark.operators import dedup as D
from vinum_spark.operators import sampling as S
from vinum_spark.operators import text as X


@dataclass
class CorpusConfig:
    """Stage toggles + knobs for :func:`prepare_corpus`. Defaults give
    the common web-corpus recipe: strip markup, normalize, quality
    gate, exact-dedup, then shard. Optional stages are off unless
    configured."""

    text_col: str = "text"
    id_col: str = "doc_id"
    strip_html: bool = False
    normalize: bool = False
    quality_filter: bool = True
    boilerplate_width: Optional[int] = None       # e.g. 4 to enable
    boilerplate_max_doc_frac: float = 0.05
    dedup: bool = True
    #: exact-dedup key columns; None keeps the default normalized-text
    #: md5 fingerprint. A stream favors a PRE-HASHED key column here
    #: (state stores the key verbatim — hash beats full text at scale).
    dedup_cols: Optional[tuple] = None
    #: exact-substring span removal (operators/dedup.py
    #: remove_duplicated_spans — the Lee et al. 2022 ExactSubstr
    #: method) as the stage between exact dedup and decontamination,
    #: the Lee-et-al pipeline order: whole-document dedup first (cheap,
    #: drops exact copies), then substring surgery on the survivors.
    #: Set to the window length n (e.g. 8) to enable. The stage
    #: replaces ``text_col`` with the span-stripped token stream
    #: (single-space-joined lowercase tokens — the operator's
    #: documented contract), so downstream n-gram stages
    #: (decontaminate) see the POST-surgery text, exactly as Lee et al.
    #: compose it. Cross-document (corpus-wide window counts): batch
    #: only, like boilerplate/decontaminate/mixture.
    despan_ngram: Optional[int] = None
    despan_min_count: int = 2
    despan_token_pattern: str = "[a-z0-9]+"
    decontaminate_against: Optional[DataFrame] = None
    decontaminate_ngram: int = 8
    mixture_weights: Optional[Dict[str, float]] = None
    mixture_budget: int = 0
    mixture_strata_col: str = "source"
    mixture_quality_col: str = "mean_token_len"
    mixture_length_col: Optional[str] = None  # default: computed token stats
    n_shards: Optional[int] = None
    shard_seed: str = "0"
    #: a learn_bpe_merges table enables the tokenize stage (map-side:
    #: bpe_tokenize_map_side, a pure projection — the pipeline's
    #: streaming composability is preserved); byte mode with the
    #: production RE2-safe GPT-2 pre-tokenizer by default, and
    #: tokenize_emit_ids adds the model-ready token_ids column
    tokenize_with: Optional[DataFrame] = None
    tokenize_byte_level: bool = True
    tokenize_pattern: Optional[str] = None  # default: GPT2ISH (byte mode)
    tokenize_emit_ids: bool = True
    #: optional (token, token_id) frame overriding the emitted id
    #: layout — e.g. load_tokenizer_gpt2(...)["vocab"], so the
    #: pipeline (batch AND streaming) lands ids under the PUBLISHED
    #: GPT-2 layout external consumers read directly
    tokenize_vocab: Optional[DataFrame] = None
    #: context-window chunking as the stage after tokenization (needs
    #: tokenize_emit_ids): each document's token_ids become 1+ rows of
    #: (original columns minus tokens/token_ids, chunk_id, token_ids,
    #: n_tokens) — model-context-sized training sequences
    #: (operators/text.py chunk_token_ids). A projection + posexplode:
    #: still zero shuffles, still streamable. chunk_stride is the
    #: window STEP (overlap = chunk_max_len - chunk_stride) — HF's
    #: `stride` is the OVERLAP; convert with
    #: chunk_stride = chunk_max_len - hf_stride (see chunk_token_ids).
    chunk_max_len: Optional[int] = None
    chunk_stride: Optional[int] = None  # default: chunk_max_len
    chunk_min_len: int = 1


def prepare_corpus(df: DataFrame, config: Optional[CorpusConfig] = None) -> DataFrame:
    """Run the configured preparation chain and return the surviving
    rows with the working text in ``config.text_col`` plus the columns
    the enabled stages add (quality signals, ``fingerprint``,
    ``shard``, …).

    Stage order is the canonical pipeline order (Dolma / DataTrove /
    CCNet all agree on the shape; the span-surgery slot follows Lee et
    al. 2022): extract → normalize → per-doc quality → cross-doc
    boilerplate → exact dedup → exact-substring span removal →
    decontaminate → mix → shard → tokenize. Each stage is exactly the
    standalone operator — no pipeline-specific variants to drift from
    the gated semantics.
    """
    c = config if config is not None else CorpusConfig()
    text_col = c.text_col
    df = _map_prefix(df, c)
    if c.boilerplate_width:
        cleaned = X.remove_boilerplate(
            df,
            col=text_col,
            id_col=c.id_col,
            width=c.boilerplate_width,
            max_doc_frac=c.boilerplate_max_doc_frac,
        ).select(c.id_col, "clean_text")
        df = (
            df.drop(text_col)
            .join(cleaned, c.id_col)
            .withColumnRenamed("clean_text", text_col)
        )
    if c.dedup:
        df = D.dedup_exact(
            df, cols=c.dedup_cols, id_col=c.id_col, text_col=text_col
        )
    if c.despan_ngram:
        # same join-back shape as boilerplate: the operator returns a
        # (id, kept_text) frame over the CURRENT survivors, and the
        # surgery must see post-dedup text (Lee et al. stage order)
        despanned = D.remove_duplicated_spans(
            df,
            n=c.despan_ngram,
            min_count=c.despan_min_count,
            text_col=text_col,
            id_col=c.id_col,
            token_pattern=c.despan_token_pattern,
        ).select(c.id_col, "kept_text")
        df = (
            df.drop(text_col)
            .join(despanned, c.id_col)
            .withColumnRenamed("kept_text", text_col)
        )
    if c.decontaminate_against is not None:
        # the eval set must see the SAME text transforms as the corpus —
        # normalizing one side only would break the exact n-gram match
        # and silently miss contamination
        eval_df = c.decontaminate_against
        if c.strip_html:
            eval_df = X.strip_html(eval_df, col=text_col, out="__clean")
            eval_df = eval_df.drop(text_col).withColumnRenamed("__clean", text_col)
        if c.normalize:
            eval_df = X.normalize_text(eval_df, col=text_col, out="__norm")
            eval_df = eval_df.drop(text_col).withColumnRenamed("__norm", text_col)
        if c.despan_ngram:
            # the despan stage rewrote corpus text into its token
            # canonical form (lowercase despan_token_pattern matches,
            # single-space-joined) — the eval text must be canonicalized
            # the SAME way (not span-stripped: eval text is not part of
            # the corpus surgery, but its REPRESENTATION must match) or
            # a mixed-case/punctuated eval gram can never equal a
            # despanned corpus gram and contamination is silently missed
            eval_df = eval_df.withColumn(
                text_col,
                F.concat_ws(
                    " ",
                    # Column args (not an interpolated expr string) so
                    # a pattern containing a quote cannot alter the SQL
                    F.regexp_extract_all(
                        F.lower(F.col(text_col)),
                        F.lit(c.despan_token_pattern),
                        F.lit(0),
                    ),
                ),
            )
        hits = D.contaminated_docs(
            df,
            eval_df,
            text_col=text_col,
            id_col=c.id_col,
            n=c.decontaminate_ngram,
        ).select(c.id_col)
        # plain anti-join: the HIT set is corpus-proportional in the
        # worst case (one common eval n-gram can flag millions of docs),
        # so broadcasting it is AQE's call, not ours — only the eval
        # GRAM frame inside contaminated_docs is always-broadcast
        df = df.join(hits, c.id_col, "left_anti")
    if c.mixture_weights:
        length_col = c.mixture_length_col
        need = [c.mixture_quality_col] + ([length_col] if length_col else [])
        if any(col not in df.columns for col in need) or length_col is None:
            # compute the token stats whenever the mixture's quality or
            # length column isn't already on the frame
            if "n_chars_calc" not in df.columns:
                df = X.with_text_stats(df, col=text_col)
            length_col = length_col or "n_chars_calc"
        # with_text_stats only adds its fixed stat columns — a custom
        # mixture_quality_col it doesn't produce would otherwise surface
        # as an unresolved-column AnalysisException deep inside
        # mixture_sample's window; fail here with the missing name
        if c.mixture_quality_col not in df.columns:
            raise ValueError(
                f"prepare_corpus: mixture_quality_col {c.mixture_quality_col!r} "
                f"is not a column of the frame and is not produced by "
                f"with_text_stats; add it upstream or pick one of "
                f"{sorted(set(df.columns))}"
            )
        df = S.mixture_sample(
            df,
            strata_col=c.mixture_strata_col,
            weights=c.mixture_weights,
            budget=c.mixture_budget,
            length_col=length_col,
            quality_col=c.mixture_quality_col,
            key_col=c.id_col,
        )
    if c.n_shards:
        df = S.with_shard(df, c.id_col, c.n_shards, seed=c.shard_seed)
    return _tokenize_stage(df, c)


def _map_prefix(df: DataFrame, c: CorpusConfig) -> DataFrame:
    """The pipeline's leading PURE-PROJECTION stages (extract ->
    normalize -> per-doc quality) — shared verbatim between the batch
    and streaming pipelines; Catalyst fuses them into the scan."""
    text_col = c.text_col
    if c.strip_html:
        df = X.strip_html(df, col=text_col, out="__clean")
        df = df.drop(text_col).withColumnRenamed("__clean", text_col)
    if c.normalize:
        df = X.normalize_text(df, col=text_col, out="__norm")
        df = df.drop(text_col).withColumnRenamed("__norm", text_col)
    if c.quality_filter:
        df = X.with_quality_rules(df, col=text_col).filter(
            F.col("quality_pass")
        )
    return df


def _tokenize_stage(df: DataFrame, c: CorpusConfig) -> DataFrame:
    """The pipeline's trailing tokenize stage (shared batch/stream): a
    pure projection that keeps every pipeline column — no join-back,
    no shuffle; the chain stays streamable map-side."""
    if c.tokenize_with is None:
        if c.chunk_max_len is not None:
            raise ValueError(
                "prepare_corpus: chunk_max_len needs the tokenize stage "
                "(set tokenize_with)"
            )
        return df
    pattern = c.tokenize_pattern
    if pattern is None:
        pattern = (
            X.GPT2ISH_SPLIT_PATTERN if c.tokenize_byte_level else "[a-z]+"
        )
    emit_ids = c.tokenize_emit_ids and c.tokenize_byte_level
    df = X.bpe_tokenize_map_side(
        df,
        c.tokenize_with,
        text_col=c.text_col,
        id_col=c.id_col,
        token_pattern=pattern,
        byte_level=c.tokenize_byte_level,
        emit_ids=emit_ids,
        vocab_df=c.tokenize_vocab,
    )
    if c.chunk_max_len is not None:
        if not emit_ids:
            raise ValueError(
                "prepare_corpus: chunk_max_len chunks token_ids — it "
                "needs tokenize_emit_ids=True and byte-level tokenization"
            )
        # doc-level token columns give way to per-chunk rows; every
        # other pipeline column (shard, signals, the text) is carried
        df = X.chunk_token_ids(
            df.drop("tokens", "n_tokens"),
            c.chunk_max_len,
            stride=c.chunk_stride,
            id_col=c.id_col,
            min_len=c.chunk_min_len,
            preserve=True,
        )
    return df


def prepare_corpus_stream(
    df: DataFrame,
    config: Optional[CorpusConfig] = None,
    ts_col: str = "ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """:func:`prepare_corpus` over a ``readStream`` frame — corpus
    preparation AS INGESTION: documents are cleaned, quality-gated,
    deduplicated, sharded, and tokenized into model-ready id sequences
    as micro-batches land, instead of in a nightly batch pass.

    Every supported stage is the EXACT operator the batch pipeline
    runs (the projection stages are shared code, not streaming
    variants), so batch and stream agree row-for-row on the surviving
    set — pinned by the q98/q99 oracle gates, which hash-match a real
    drained stream against the batch semantics recomputed in DuckDB.

    Stage mapping:

    - strip_html / normalize / quality_filter — pure projections,
      verbatim (``_map_prefix``).
    - dedup — Spark's ``dropDuplicatesWithinWatermark`` keyed on
      ``config.dedup_cols`` (or the normalized-text fingerprint, added
      here exactly as batch ``dedup_exact`` derives it). Two
      divergences from the batch operator, both inherent to streams:
      the survivor is the FIRST ARRIVAL, not the smallest id (the
      surviving KEY SET is identical; the representative row may
      differ — key the downstream on the dedup key, or pre-normalize
      the text, when representatives must match), and state is evicted
      once the watermark passes a key's event time (a duplicate
      arriving within ``watermark`` of its first occurrence is ALWAYS
      removed; a later one may be re-admitted — the bounded-state
      trade any 100 TB/day stream must make; ``stream_distinct`` in
      streaming/stateful.py offers the processing-time variant).
    - n_shards — deterministic md5 projection, verbatim.
    - tokenize — ``bpe_tokenize_map_side``, the map-side operator
      built for exactly this (``_tokenize_stage``, shared).

    Stages that need cross-document joins or windows (boilerplate
    removal, decontamination, mixture sampling) cannot run map-side
    on an unbounded stream — they raise here and belong in the batch
    refinement pass over the landed shards.

    ``ts_col`` must be an event-time column of ``df`` (synthesize a
    deterministic one upstream if the source has none); ``watermark``
    bounds dedup state.
    """
    c = config if config is not None else CorpusConfig()
    unsupported = [
        name
        for name, on in (
            ("boilerplate_width", c.boilerplate_width),
            ("despan_ngram", c.despan_ngram),
            ("decontaminate_against", c.decontaminate_against is not None),
            ("mixture_weights", c.mixture_weights),
        )
        if on
    ]
    if unsupported:
        raise ValueError(
            f"prepare_corpus_stream: stage(s) {unsupported} need "
            "cross-document joins/windows and cannot run on an unbounded "
            "stream — run them in the batch refinement pass"
        )
    df = _map_prefix(df, c)
    if c.dedup:
        if c.dedup_cols:
            key_cols = list(c.dedup_cols)
        else:
            df = X.with_fingerprint(df, c.text_col)
            key_cols = ["fingerprint"]
        df = df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    if c.n_shards:
        df = S.with_shard(df, c.id_col, c.n_shards, seed=c.shard_seed)
    return _tokenize_stage(df, c)
