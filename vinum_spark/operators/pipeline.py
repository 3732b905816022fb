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

from dataclasses import dataclass, field
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
    decontaminate_against: Optional[DataFrame] = None
    decontaminate_ngram: int = 8
    mixture_weights: Optional[Dict[str, float]] = None
    mixture_budget: int = 0
    mixture_strata_col: str = "source"
    mixture_quality_col: str = "mean_token_len"
    n_shards: Optional[int] = None
    shard_seed: str = "0"


def prepare_corpus(df: DataFrame, config: CorpusConfig = CorpusConfig()) -> DataFrame:
    """Run the configured preparation chain and return the surviving
    rows with the working text in ``config.text_col`` plus the columns
    the enabled stages add (quality signals, ``fingerprint``,
    ``shard``, …).

    Stage order is the canonical pipeline order (Dolma / DataTrove /
    CCNet all agree on the shape): extract → normalize → per-doc
    quality → cross-doc boilerplate → exact dedup → decontaminate →
    mix → shard. Each stage is exactly the standalone operator — no
    pipeline-specific variants to drift from the gated semantics.
    """
    c = config
    text_col = c.text_col
    if c.strip_html:
        df = X.strip_html(df, col=text_col, out="__clean")
        df = df.drop(text_col).withColumnRenamed("__clean", text_col)
    if c.normalize:
        df = X.normalize_text(df, col=text_col, out="__norm")
        df = df.drop(text_col).withColumnRenamed("__norm", text_col)
    if c.quality_filter:
        df = X.with_quality_rules(df, col=text_col).filter(F.col("quality_pass"))
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
        df = D.dedup_exact(df, id_col=c.id_col, text_col=text_col)
    if c.decontaminate_against is not None:
        hits = D.contaminated_docs(
            df,
            c.decontaminate_against,
            text_col=text_col,
            id_col=c.id_col,
            n=c.decontaminate_ngram,
        ).select(c.id_col)
        df = df.join(F.broadcast(hits), c.id_col, "left_anti")
    if c.mixture_weights:
        if c.mixture_quality_col == "mean_token_len" and (
            "mean_token_len" not in df.columns
        ):
            df = X.with_text_stats(df, col=text_col)
        df = S.mixture_sample(
            df,
            strata_col=c.mixture_strata_col,
            weights=c.mixture_weights,
            budget=c.mixture_budget,
            length_col="n_chars_calc" if "n_chars_calc" in df.columns else "n_chars",
            quality_col=c.mixture_quality_col,
            key_col=c.id_col,
        )
    if c.n_shards:
        df = S.with_shard(df, c.id_col, c.n_shards, seed=c.shard_seed)
    return df
