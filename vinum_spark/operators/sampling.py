"""Deterministic sampling operators for training-data pipelines.

Training pipelines need samples that are (a) reproducible across reruns
and engines — a re-shard or a Spark upgrade must not change which
documents are in the training set — and (b) computable without a global
pass. ``rand(seed)`` fails both: it is partitioning-dependent and not
portable to any other engine. These operators instead hash a stable key
with md5 (every engine agrees on md5) and threshold the hex prefix, so
membership is a pure per-row function of (key, seed): no shuffle, no
state, trivially re-runnable on 100 TB, and an external system (DuckDB,
Trino, a Python validator) can reproduce the exact sample.

``group_sample_topn`` is the deterministic replacement for per-group
reservoir sampling: the n smallest md5 values per group ARE a uniform
without-replacement sample of the group, selected with one shuffle on
the group key.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Width of the hex prefix compared against the threshold. 8 hex digits
#: = 32 bits of hash, so the realized fraction deviates from the target
#: by at most 2^-32 — far below sampling noise at any corpus size.
_HEX_DIGITS = 8


def sample_threshold_hex(fraction: float) -> str:
    """Lexicographic hex threshold selecting ``fraction`` of uniform
    md5 prefixes: ``substr(md5(k), 1, 8) < threshold`` keeps that share.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = int(fraction * (16 ** _HEX_DIGITS))
    if n >= 16 ** _HEX_DIGITS:
        # fraction == 1.0: 16^8 is 9 hex digits, which compares BELOW
        # most 8-digit prefixes lexicographically ('1...' < 'f...').
        # 'g' sorts above every hex digit in ASCII (and in DuckDB's
        # byte-wise VARCHAR order), so `prefix < 'g'` keeps everything.
        return "g"
    return format(n, f"0{_HEX_DIGITS}x")


def _full_key(key: Column, seed: str) -> Column:
    """Full 128-bit md5 hex of (key, seed) — collision-free in practice,
    used wherever a total ORDER is needed (ranking, within-shard sort).
    """
    return F.md5(F.concat_ws("\x1f", key.cast("string"), F.lit(seed)))


def _sample_key(key: Column, seed: str) -> Column:
    return F.substring(_full_key(key, seed), 1, _HEX_DIGITS)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "0"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by ``md5(key || seed)`` —
    reproducible across reruns, partitionings, and engines. Map-side
    only: the predicate is a codegen'd string compare, pushed to the
    scan like any filter. Different ``seed`` values yield independent
    samples (disjoint train/validation splits via complementary
    thresholds on one seed, or independent draws via two seeds).
    """
    thr = sample_threshold_hex(fraction)
    return df.filter(_sample_key(F.col(key_col), seed) < thr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Dict[str, float],
    key_col: str,
    seed: str = "0",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the downsample-the-head /
    keep-the-tail move every data-mixing pipeline makes (e.g. cap web
    crawl at 10%, keep 100% of books). ``fractions`` maps stratum value
    to its keep-rate; strata not listed get ``default_fraction``.

    Still map-side only: the per-row threshold is a CASE over the
    stratum column compared against the same md5 prefix. No shuffle, no
    per-stratum pass, and adding a stratum is a plan-time change.
    """
    thr: Column = F.lit(sample_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(sample_threshold_hex(frac))
        ).otherwise(thr)
    return df.filter(_sample_key(F.col(key_col), seed) < thr)


def group_sample_topn(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str,
    seed: str = "0",
    out: str = "sample_rank",
) -> DataFrame:
    """Uniform without-replacement sample of up to ``n`` rows per group:
    rank rows inside each group by ``md5(key || seed)`` and keep the n
    smallest. Deterministic and engine-portable like the fraction
    samplers, but with an exact per-group count — the shape used for
    "at most n examples per domain" caps.

    One shuffle on ``group_col``. Ranking uses the FULL 32-hex md5 with
    ``key_col`` as the final tiebreaker, so the selected rows are a
    total deterministic order even across md5-prefix collisions and
    duplicate keys — an 8-hex (32-bit) prefix would collide with ~10%
    probability in a 30k-row group and make the sample
    partitioning-dependent. At 100 TB prefer this over
    ``collect_list``-based reservoirs: the window's partial sort spills
    gracefully, and with n small Spark's WindowGroupLimit pushes the
    rank filter below the sort (rank <= n prunes map-side).
    """
    rk = _full_key(F.col(key_col), seed)
    w = Window.partitionBy(group_col).orderBy(rk.asc(), F.col(key_col).asc())
    return (
        df.withColumn(out, F.row_number().over(w))
        .filter(F.col(out) <= n)
    )


def with_shard(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "0",
    out: str = "shard",
) -> DataFrame:
    """Stable shard assignment: ``int(md5(key || seed)[:8], 16) %
    n_shards`` — the deterministic global shuffle behind training-data
    export. Every row's shard is a pure function of (key, seed), so a
    re-run, a different partitioning, or a different engine produces
    the identical sharding (DuckDB: ``('0x' || substr(md5(..), 1,
    8))::UBIGINT % n``), and the 32-bit hash spreads keys uniformly
    regardless of key skew or ordering.

    Map-side only. Pair with :func:`export_shards` to materialize.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _sample_key(F.col(key_col), seed)
    return df.withColumn(
        out, (F.conv(h, 16, 10).cast("bigint") % n_shards).cast("int")
    )


def export_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: str = "0",
) -> None:
    """Write the frame as ``path/shard=K/`` parquet directories with a
    deterministic within-shard order — the terminal global-shuffle step
    of a training-data pipeline.

    One shuffle total: ``repartition(n_shards, shard)`` routes each
    shard VALUE to a single task (hash collisions may co-locate two
    shards in one task — still one file per shard, some tasks idle), so
    ``partitionBy`` emits ONE file per shard directory instead of
    (tasks × shards) fragments — at 1000 executors the naive write
    would scatter every shard across every task and produce a million
    tiny files. Rows are sorted within each task by ``(shard,
    full-md5 order key, key_col)``: leading with the partition column
    lets the file writer stream the pre-sorted input without inserting
    its own sort (which would not be order-stable), and the full-hash
    + key tiebreak makes the within-shard order a total function of
    (key, seed) — the export is a reproducible pseudo-random
    permutation of the corpus, stable across reruns, with no global
    sort.
    """
    sharded = with_shard(df, key_col, n_shards, seed=seed)
    order_key = _full_key(F.col(key_col), seed + "#order")
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(F.col("shard"), order_key, F.col(key_col))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def length_bucket_stats(
    df: DataFrame,
    n_tokens_col: str = "n_tokens",
    bucket_width: int = 64,
    pack_len: Optional[int] = 2048,
) -> DataFrame:
    """Token-length histogram + sequence-packing capacity per bucket —
    the planning query behind packed-batch training (bucket documents
    by length, then pack each bucket into fixed ``pack_len``-token
    rows). Returns per-bucket ``(bucket_lo, n_docs, sum_tokens,
    n_packed_seqs)`` where ``n_packed_seqs = ceil(sum_tokens /
    pack_len)`` is the bin-capacity lower bound on packed sequences.

    One partial-aggregated shuffle on the bucket id; the bucket id is a
    codegen'd integer divide, so the histogram runs at scan speed.
    """
    bucket_lo = (
        (F.col(n_tokens_col) / bucket_width).cast("bigint") * bucket_width
    ).alias("bucket_lo")
    agg = df.groupBy(bucket_lo).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens_col).cast("bigint").alias("sum_tokens"),
    )
    if pack_len is not None:
        agg = agg.withColumn(
            "n_packed_seqs",
            F.ceil(F.col("sum_tokens") / F.lit(pack_len)).cast("bigint"),
        )
    return agg


def pack_sequences(
    df: DataFrame,
    length_col: str,
    key_col: str,
    budget: int,
    n_shards: int = 32,
    seed: str = "0",
) -> DataFrame:
    """Budget-striped sequence packing: assign each document to a
    training sequence so every sequence holds ~``budget`` tokens — the
    batch-assembly step between a filtered corpus and the trainer.

    Within each deterministic shard (:func:`with_shard` on ``key_col``),
    documents are ordered by the same md5 rank used everywhere else and
    ``seq_id = floor(tokens_before / budget)`` — the document that
    crosses a budget boundary STRADDLES it (the trainer's sequence
    assembler splits it), which is what makes the rule a pure window
    expression instead of a sequential first-fit loop. The assignment
    is a total function of (key, seed, budget): any engine, any
    partitioning, any cluster size produces the identical packing.

    Returns the input plus ``shard``, ``seq_id``, ``seq_pos`` (0-based
    token offset of this document within its shard's stripe).

    Scale shape: one shuffle (hash on shard), one in-partition sort per
    shard for the running sum — no global sort, no driver loop. Shards
    bound both sort size and skew: 100 TB / ``n_shards`` chosen so a
    shard's documents fit a task's spill budget, and every shard packs
    independently (and in parallel) by construction.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    sharded = with_shard(df, key_col, n_shards, seed)
    rank = _full_key(F.col(key_col), seed)
    w = (
        Window.partitionBy("shard")
        .orderBy(rank.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(F.col(length_col)).over(w), F.lit(0))
    return (
        sharded.withColumn("seq_pos", before.cast("bigint"))
        .withColumn(
            "seq_id", F.floor(F.col("seq_pos") / F.lit(budget)).cast("bigint")
        )
    )


def pack_token_blocks(
    df: DataFrame,
    block_size: int,
    key_col: str = "doc_id",
    ids_col: str = "token_ids",
    n_shards: int = 32,
    seed: str = "0",
    drop_last: bool = True,
) -> DataFrame:
    """Assemble the FINAL pre-training artifact: fixed-size contiguous
    blocks of token ids, documents concatenated back-to-back in the
    deterministic md5-shard stream order (the GPT-2 data recipe —
    close each document with ``append_eos`` upstream if the model
    wants boundary markers; the separator is the caller's token
    choice, not this operator's).

    Fully distributed, no sequential assembly loop anywhere:
    :func:`pack_sequences` (budget = ``block_size``) gives every
    document its absolute token offset within its shard's stream (one
    hash shuffle + one in-shard sort over doc-COUNT-sized rows); a
    document's tokens therefore occupy the contiguous position range
    ``[seq_pos, seq_pos + len)``, which overlaps blocks
    ``seq_pos div block_size .. (seq_pos+len-1) div block_size`` — so
    each document explodes into its overlapped BLOCK RANGE (one row
    per (doc, block) pair, ~``len/block_size + 1`` rows) carrying the
    array SLICE that lands in that block, and ``groupBy (shard,
    block_id)`` stitches the slices in position order. The same corpus
    of token bytes crosses the one unavoidable shuffle, but as
    ~``block_size``× fewer rows than the previous per-token
    ``posexplode`` (round 19, guide §2.3: fewer, larger shuffle rows;
    measured ~2× on the pack stage alone at 8M tokens, diluted to
    ~1.1-1.2× on the full q102 chain whose wall is mostly BPE
    tokenization). Skew stays bounded by
    construction: a (shard, block) group holds at most ``block_size``
    slice rows and exactly ``block_size`` tokens. The assignment is a
    total function of (key, seed, block_size): any engine, any
    partitioning, any cluster size packs identically.

    ``drop_last=True`` (the trainer convention) drops each shard's
    final partial block. Returns (shard, block_id, token_ids,
    n_tokens) with ``block_id`` dense from 0 per shard.
    """
    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    # size(NULL) is -1 under non-ANSI mode (and NULL under ANSI):
    # either would corrupt every later document's running offset in
    # the shard — a NULL id sequence must contribute exactly 0
    packed = pack_sequences(
        df.withColumn("__len", F.greatest(F.size(ids_col), F.lit(0))),
        "__len",
        key_col,
        budget=block_size,
        n_shards=n_shards,
        seed=seed,
    )
    first_b = F.floor(F.col("seq_pos") / block_size)
    last_b = F.floor(
        (F.col("seq_pos") + F.col("__len") - 1) / block_size
    )
    # __len > 0 guard: sequence(a, b) runs DESCENDING when b < a, and
    # an empty document at an exact block boundary has last_b < first_b
    pieces = (
        packed.filter(F.col("__len") > 0)
        .select(
            "shard",
            "seq_pos",
            "__len",
            F.col(ids_col).alias("__ids"),
            F.explode(F.sequence(first_b, last_b)).alias("block_id"),
        )
        .select(
            "shard",
            F.col("block_id").cast("bigint").alias("block_id"),
            # the slice of this doc that lands in this block, and its
            # offset within the block — slices tile the block exactly,
            # so __p is unique per (shard, block) group
            F.greatest(
                F.col("block_id") * block_size - F.col("seq_pos"), F.lit(0)
            ).cast("int").alias("__s"),
            F.least(
                F.col("__len"),
                (F.col("block_id") + 1) * block_size - F.col("seq_pos"),
            ).cast("int").alias("__e"),
            F.greatest(
                F.col("seq_pos") - F.col("block_id") * block_size, F.lit(0)
            ).cast("int").alias("__p"),
            "__ids",
        )
        .select(
            "shard",
            "block_id",
            "__p",
            F.expr("slice(__ids, __s + 1, __e - __s)").alias("__piece"),
        )
    )
    blocks = pieces.groupBy("shard", "block_id").agg(
        F.expr(
            "flatten(transform(array_sort(collect_list("
            "struct(__p, __piece))), s -> s.__piece))"
        ).alias("token_ids"),
        F.expr("sum(size(__piece))").cast("bigint").alias("n_tokens"),
    )
    if drop_last:
        blocks = blocks.filter(F.col("n_tokens") == block_size)
    return blocks


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: Dict[str, float],
    budget: int,
    length_col: str,
    quality_col: str,
    key_col: str,
) -> DataFrame:
    """Quality-weighted corpus mixing: fill each stratum's share of a
    global token ``budget`` with its highest-``quality_col`` documents —
    the data-mixing step that blends sources (web/books/code/…) to
    target proportions for a training run.

    A document is kept when the cumulative ``length_col`` of the
    strictly-better documents in its stratum is below
    ``weights[stratum] * budget`` — so every stratum's selection may
    STRADDLE its boundary by at most one document (same budget-striping
    rule as :func:`pack_sequences`, which keeps the predicate a pure
    window expression). Ordering is (quality desc, key asc) — total and
    engine-portable. Strata missing from ``weights`` get nothing.

    Scale shape: one hash shuffle on the stratum + an in-partition sort
    per stratum; the weight table enters as an inlined CASE expression
    (it is query configuration, not data). No global sort, no driver
    loop — the same plan at 5 000 or 5 billion documents. Heavily
    skewed strata (web >> wiki) sort within one task each; if a single
    stratum outgrows a task's spill budget, pre-split it with
    :func:`with_shard` and rescale its weight.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    alloc = F.lit(None).cast("double")
    for stratum, frac in weights.items():
        alloc = F.when(F.col(strata_col) == stratum, F.lit(float(frac) * budget)).otherwise(alloc)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.col(quality_col).desc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(F.col(length_col)).over(w), F.lit(0))
    return (
        df.withColumn("__alloc", alloc)
        .withColumn("__before", before)
        .filter(F.col("__before") < F.col("__alloc"))
        .drop("__alloc", "__before")
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "dsir",
    alpha: float = 1.0,
    token_pattern: str = "[a-z0-9]+",
) -> DataFrame:
    """Data Selection via Importance Resampling — DSIR (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling") re-expressed relationally: pick the ``k`` raw
    documents whose hashed-n-gram distribution looks most like a
    TARGET corpus, by importance weight under bag-of-hashed-ngrams
    language models, resampled with deterministic Gumbel-top-k.

    Stages, all JVM-side (no UDF anywhere):

    1. features — unigrams + bigrams of the lowercased
       ``token_pattern`` tokens, hashed into ``n_buckets`` buckets via
       the md5-prefix integer (the same engine-portable hash the
       q59/q62 sampling family gates);
    2. per-bucket log-ratio ``r_b = ln(p_b) - ln(q_b)`` with add-alpha
       smoothing, where p is the target and q the raw bucket
       distribution — a ``n_buckets``-row table, BROADCAST (the corpus
       never shuffles for the lookup; the only corpus-keyed shuffle is
       the per-document weight sum, partial-aggregated);
    3. per-document importance weight ``log w = Σ_grams r_bucket``
       (documents with no tokens get weight 0 — candidates, never
       dropped);
    4. Gumbel-top-k resampling: ``score = log w + g_i`` with
       ``g_i = -ln(-ln(u_i))`` and ``u_i`` a deterministic md5-derived
       uniform in (0,1) keyed by (doc_id, seed) — exactly
       without-replacement sampling proportional to ``w`` (Gumbel-max
       trick), reproducible across engines and runs. Scores are
       ROUNDED to 6 decimals before ranking (ties broken by id), so
       float summation-order differences between engines cannot flip
       the selected set at a razor-thin boundary.

    Returns the selected rows: ``(id_col, score)``, ``score`` the
    rounded Gumbel-perturbed log-weight, ordered by rank.

    100 TB shape: the target is benchmark/domain-sized (MBs) and its
    bucket table is O(n_buckets) regardless of corpus size; raw-side
    work is ONE gram explode, pre-aggregated per (document, bucket)
    into a lazily ``localCheckpoint``-ed frame (≤ docs × n_buckets
    rows; materialized once by the first action and shared by both
    consumers; blocks are freed with the returned frame's references —
    a long-lived process issuing many calls should budget one such
    frame per in-flight call, the bounded per-call trade chosen in
    round 19 over the previous process-global one-slot ``persist()``,
    which survived across calls and let repeat invocations skip the
    corpus explode they claim to measure), feeding both the
    raw bucket histogram and the broadcast-joined weight sum. The
    bucket-total
    denominators are computed INSIDE the plan (a whole-table window
    over the n_buckets-row tables) — no eager collect, the call is
    fully lazy. The only other corpus touch is the final id join's
    column-pruned scan of ``raw`` (needed to keep zero-token documents
    as candidates; it reads one column).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")

    import math

    def grams(df: DataFrame) -> DataFrame:
        toks = df.select(
            F.col(id_col),
            # Column args (not an interpolated expr string) so a
            # pattern containing a quote cannot alter the SQL
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(token_pattern), F.lit(0)
            ).alias("__w"),
        )
        uni = toks.select(id_col, F.explode("__w").alias("__g"))
        # short-doc guard: sequence(1, 0) is DESCENDING in Spark (the
        # documented trap); a 0-or-1-token doc has no bigrams
        bi = toks.select(
            id_col,
            F.explode(
                F.expr(
                    "if(size(__w) < 2, array(), "
                    "transform(sequence(1, size(__w) - 1), "
                    "i -> concat(__w[i-1], ' ', __w[i])))"
                )
            ).alias("__g"),
        )
        return uni.unionByName(bi).withColumn(
            "__b",
            (
                F.conv(F.substring(F.md5("__g"), 1, 8), 16, 10)
                .cast("long")
                % n_buckets
            ).cast("int"),
        )

    tg = grams(target).groupBy("__b").agg(F.count(F.lit(1)).alias("__ct"))
    # pre-aggregate the raw grams per (document, bucket): the bucket
    # histogram AND the per-document weight sum both derive from this
    # frame, so the corpus-sized explode runs ONCE per action (lazy
    # localCheckpoint — unpersisted lineage would recompute it per
    # consumer; per-call only, nothing survives the returned frame).
    # Σ_grams r_bucket == Σ_buckets n_doc_bucket · r_bucket.
    rgb = (
        grams(raw)
        .groupBy(id_col, "__b")
        .agg(F.count(F.lit(1)).alias("__cn"))
        .localCheckpoint(eager=False)
    )
    rb = rgb.groupBy("__b").agg(F.sum("__cn").alias("__cr"))
    # denominators as a broadcast 1-row aggregate over the
    # n_buckets-row merged frame — stays lazy (no call-time collect)
    ct = F.coalesce("__ct", F.lit(0)).cast("double")
    cr = F.coalesce("__cr", F.lit(0)).cast("double")
    merged = rb.join(tg, "__b", "full_outer")
    # denominators as whole-table window sums over the ≤ n_buckets-row
    # merged frame — stays lazy, no extra join. (A crossJoin — or an
    # equi-join on a literal key, which Catalyst constant-folds back
    # into one — plans as the BroadcastNestedLoopJoin the
    # inventory-wide plan pin forbids; the single-partition WindowExec
    # this emits instead touches at most n_buckets rows.)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t_denom = F.sum(ct).over(w_all) + float(alpha * n_buckets)
    r_denom = F.sum(cr).over(w_all) + float(alpha * n_buckets)
    ratio = merged.select(
        "__b",
        (F.log((ct + alpha) / t_denom) - F.log((cr + alpha) / r_denom))
        .alias("__r"),
    )
    weights = (
        rgb.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(F.sum(F.col("__cn") * F.col("__r")).alias("__logw"))
    )
    # deterministic Gumbel noise: u in (0,1) from the md5-prefix
    # integer (+0.5 keeps u strictly inside the open interval)
    u = (
        F.conv(F.substring(_full_key(F.col(id_col), seed), 1, 8), 16, 10)
        .cast("double")
        + 0.5
    ) / float(16 ** 8)
    g = -F.log(-F.log(u))
    return (
        raw.select(id_col)
        .join(weights, id_col, "left")
        .select(
            id_col,
            F.round(F.coalesce("__logw", F.lit(0.0)) + g, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
