"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the dominant join (orders ↔ lineitem on orderkey) shuffles
both sides on every query unless the tables are bucketed on the join key
at write time. These helpers wrap ``bucketBy`` writes and verify the
shuffle actually disappears.

Usage (one-time layout cost, every subsequent join is exchange-free on
the bucketed key):

    write_bucketed(orders_df,  "orders_b",  "o_orderkey", buckets=64)
    write_bucketed(lineitem_df, "lineitem_b", "l_orderkey", buckets=64)
    joined = spark.table("orders_b").join(
        spark.table("lineitem_b"),
        F.col("o_orderkey") == F.col("l_orderkey"))
    # plan shows SortMergeJoin with NO Exchange on either side
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Union[str, Sequence[str]],
    buckets: int = 64,
    sort_cols: Union[str, Sequence[str], None] = None,
    path: Optional[str] = None,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) table.

    ``buckets`` should scale with data volume: target ~128-512 MB per
    bucket file so tasks stay balanced; both join sides must use the SAME
    bucket count and key for the exchange to be elided.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.format(fmt).mode("overwrite").bucketBy(buckets, *cols)
    if sort_cols:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*s)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the join plan contains no Exchange (bucketing worked)."""
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "simple"
    )
    return "Exchange" not in plan


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    partition_cols: Union[str, Sequence[str], None] = None,
) -> int:
    """Rewrite a parquet dataset into ~``target_file_bytes`` files — the
    small-file compaction every long-running ingestion pipeline needs:
    streaming sinks and incremental batches leave thousands of KB-sized
    files whose per-file open/footer cost dominates scans and whose
    count explodes driver file-listing memory at 100 TB.

    File count = ceil(current total bytes / target), from the scan's
    file-listing statistics (no data read, no extra job). The rewrite
    itself is one ``repartition`` — a round-robin shuffle that also
    rebalances skewed input files — or, with ``partition_cols``, a hash
    shuffle on those columns so each hive partition is written by the
    tasks that own it. Returns the chosen file count.

    The 256 MB default matches ``maxPartitionBytes``-sized scan splits:
    compacted files re-split cleanly on read. Run per partition (point
    ``src`` at one hive partition) to bound the shuffle to fresh data
    instead of rewriting the corpus.
    """
    if target_file_bytes < 1:
        raise ValueError(f"target_file_bytes must be >= 1, got {target_file_bytes}")
    # the src read is lazy and dst is written with mode('overwrite'):
    # dst == src would delete the source files before the read executes
    # and lose the dataset, so in-place compaction is refused — compact
    # into a sibling dir and swap
    if os.path.abspath(dst) == os.path.abspath(src):
        raise ValueError(
            f"compact_parquet: dst must differ from src ({src!r}); in-place "
            "compaction would drop the lazily-read source before the rewrite "
            "runs. Write to a sibling path and rename."
        )
    df = spark.read.parquet(src)
    total = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    n_files = max(1, -(-total // target_file_bytes))
    if partition_cols:
        cols = (
            [partition_cols]
            if isinstance(partition_cols, str)
            else list(partition_cols)
        )
        # Hashing on the partition columns alone would write ONE file per
        # hive partition regardless of size (a 20 GB skewed partition ->
        # one 20 GB file from one task). Apportion the global file count
        # to partitions by row share (bytes/rows assumed uniform within a
        # dataset, half-up rounding) and salt the shuffle key so each
        # partition splits into ~its own file count. The per-partition
        # frame is JOINED back on the key, never inlined as literals: a
        # collected when-chain is fine at dozens of partitions but blows
        # up plan size and driver memory at thousands. The two .first()
        # calls below each fetch a single aggregate row (bounded).
        # persist the (tiny, partition-cardinality-bounded) counts
        # frame FIRST: total_rows and the __k aggregate below both
        # derive from it, and without the persist each would re-run
        # the full-source groupBy scan+shuffle
        counts = df.groupBy(*cols).agg(
            F.count(F.lit(1)).alias("__rows")
        ).persist()
        total_rows = max(
            1, int(counts.agg(F.sum("__rows").alias("t")).first()["t"] or 0)
        )
        kdf = counts.select(
            *cols,
            F.greatest(
                F.lit(1),
                F.round(
                    F.lit(float(n_files)) * F.col("__rows") / F.lit(float(total_rows))
                ).cast("int"),
            ).alias("__k"),
        )
        try:
            n_files = int(kdf.agg(F.sum("__k").alias("s")).first()["s"])
            right = kdf
            for c in cols:
                right = right.withColumnRenamed(c, f"__p_{c}")
            cond = None
            for c in cols:
                e = df[c].eqNullSafe(F.col(f"__p_{c}"))
                cond = e if cond is None else cond & e
            (
                df.join(F.broadcast(right), cond, "left")
                .withColumn(
                    "__salt",
                    F.floor(
                        F.rand(42) * F.coalesce(F.col("__k"), F.lit(1))
                    ).cast("int"),
                )
                .repartition(n_files, *cols, F.col("__salt"))
                .drop("__salt", "__k", *[f"__p_{c}" for c in cols])
                .write.mode("overwrite")
                .partitionBy(*cols)
                .parquet(dst)
            )
        finally:
            counts.unpersist()
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files


# ---------------------------------------------------------------------------
# Persistent bucketed fingerprint store
# ---------------------------------------------------------------------------
#
# The storage side of incremental/streaming dedup
# (operators/dedup.dedup_against_store, streaming/stateful.
# run_stream_dedup_against_store): a growing SET of 16-byte digests
# that every new batch anti-joins against. Kept as a plain parquet
# directory, the store side of that anti-join re-shuffles IN FULL on
# every micro-batch — O(store) work per batch, the difference between
# O(batch) and O(store) at a 2 TB store. Kept as a BUCKETED table on
# the fingerprint, the store side's exchange is elided by Catalyst:
# each batch shuffles only ITSELF into the store's bucket layout
# (plan-pinned in tests/test_plans.py).
#
# Layout — an LSM-style BASE + DELTA under one root:
#
#     <store_path>/v0/     base: bucketed SORTED parquet + _SUCCESS,
#                          exactly one file per bucket (immutable)
#     <store_path>/v1/     (written whole by a compaction, then current)
#     <store_path>/delta/  append staging: plain parquet part files
#
# The catalog table (in-memory catalog; name derived from the path)
# points at the CURRENT base version. Appends land as plain files in
# ``delta/`` — the base version is IMMUTABLE after its compaction, so
# every bucket stays exactly one fingerprint-sorted file and the scan
# reports its sort order (``spark.sql.legacy.bucketedTableScan.
# outputOrdering``, set by ensure_fingerprint_store): the merge join
# against the base needs NO store-side Sort, ever — the per-batch
# store cost drops from scan + O(store log store) sort to scan alone.
# Membership = base ∪ delta; the delta side is bounded by
# ``compact_at_files`` appends, so its per-batch join is O(delta),
# not O(store).
#
# Compaction snapshot-lists the delta files, writes base ∪ snapshot as
# the next version COMPLETELY (including its _SUCCESS), re-points the
# table (a metadata-only swap), deletes EXACTLY the snapshot files —
# an append racing the compaction lands a file the snapshot missed,
# which simply stays in delta for the next cycle: concurrent appends
# are never lost — keeps the just-superseded version as a GRACE copy
# for concurrent readers, and deletes everything older. A crash at any
# step leaves a complete, discoverable store: version discovery takes
# the HIGHEST version bearing _SUCCESS, a partial write without
# _SUCCESS is invisible, and a crash between the swap and the delta
# delete only leaves fingerprints duplicated between base and delta —
# a SUPERSET of the true set, which can only suppress duplicates it
# should suppress anyway; the next compaction's dropDuplicates folds
# them. No rename window where the store doesn't exist (the failure
# mode that would silently re-admit every already-seen fingerprint).
# The bucket count is persisted in _store_meta.json and validated on
# every open (a drifted count would probe the wrong bucket — silent
# re-admission); a root holding plain parquet files instead of v<k>
# versions is refused with a migration recipe rather than shadowed by
# an empty store.

#: files per delta append — round-robin, so the (batch-sized) append
#: keeps its upstream parallelism while delta file count grows by a
#: small constant per batch; compact_at_files bounds the total
_DELTA_FILES_PER_APPEND = 4


def _store_fs(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def store_table_name(store_path: str) -> str:
    """Catalog table name for a fingerprint store root (path-derived:
    one store directory == one table, re-derivable after restart)."""
    tag = hashlib.md5(store_path.encode()).hexdigest()[:12]
    return f"fpstore_{tag}"


def current_store_version(spark, store_path: str) -> Optional[int]:
    """Highest complete version under ``store_path`` (a ``v<k>`` child
    directory bearing ``_SUCCESS``), or None when no complete version
    exists. Partial writes (no ``_SUCCESS``) are invisible by design.

    A root that exists, holds NO version directory, and is not empty
    is NOT a store — it is almost certainly a pre-existing PLAIN
    parquet fingerprint directory. Treating it as "no store yet" would
    create an empty v0 beside the old files and silently re-admit
    every already-seen fingerprint, so that shape raises with the
    migration recipe instead."""
    fs, root, jvm = _store_fs(spark, store_path)
    if not fs.exists(root):
        return None
    best = None
    stray = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        m = re.fullmatch(r"v(\d+)", name)
        if not m or not status.isDirectory():
            if name != "delta" and not name.startswith(("_", ".")):
                stray.append(name)
            continue
        marker = jvm.org.apache.hadoop.fs.Path(status.getPath(), "_SUCCESS")
        if fs.exists(marker):
            k = int(m.group(1))
            best = k if best is None or k > best else best
    if best is None and stray:
        raise ValueError(
            f"{store_path!r} contains non-store entries "
            f"({stray[:3]}{'...' if len(stray) > 3 else ''}) and no "
            "complete v<k> version — refusing to create a fresh store "
            "over what looks like an existing PLAIN parquet fingerprint "
            "directory (an empty store beside it would silently re-admit "
            "every already-seen fingerprint). Migrate explicitly: "
            "fps = spark.read.parquet(old_path); "
            "ensure_fingerprint_store(spark, new_path, buckets); "
            "append_fingerprints(fps, new_path, buckets); "
            "compact_fingerprint_store(spark, new_path, buckets)."
        )
    return best


def _store_meta_path(jvm, store_path: str):
    return jvm.org.apache.hadoop.fs.Path(f"{store_path}/_store_meta.json")


def _write_store_meta(spark, store_path: str, buckets: int) -> None:
    import json as _json

    fs, _, jvm = _store_fs(spark, store_path)
    out = fs.create(_store_meta_path(jvm, store_path), True)
    try:
        out.write(bytearray(_json.dumps({"buckets": buckets}), "utf-8"))
    finally:
        out.close()


def _read_store_meta(spark, store_path: str) -> Optional[dict]:
    import json as _json

    fs, _, jvm = _store_fs(spark, store_path)
    p = _store_meta_path(jvm, store_path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return _json.loads(raw)


def _check_store_buckets(spark, store_path: str, buckets: int) -> None:
    """The bucket count IS the physical file layout: reopening a
    16-bucket store as 32 buckets makes the anti-join look for each
    fingerprint in the wrong bucket — silent re-admission, no error.
    The count is therefore persisted at create time and validated on
    every open/compact; config drift raises instead of corrupting."""
    meta = _read_store_meta(spark, store_path)
    if meta is None:
        raise ValueError(
            f"{store_path!r} has a store version but no _store_meta.json "
            "— refusing to guess its bucket count (a wrong count makes "
            "the anti-join miss stored fingerprints silently). Restore "
            "the metadata file with the count the store was created with."
        )
    if int(meta["buckets"]) != buckets:
        raise ValueError(
            f"fingerprint store {store_path!r} was created with "
            f"buckets={meta['buckets']} but was opened with "
            f"buckets={buckets}; the count is the physical file layout "
            "and must match across every open"
        )


def _table_location(spark, table: str) -> Optional[str]:
    if not spark.catalog.tableExists(table):
        return None
    for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if r["col_name"] == "Location":
            return r["data_type"]
    return None


def _register_store_table(
    spark, table: str, version_dir: str, buckets: int
) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} (fingerprint STRING) USING PARQUET "
        f"CLUSTERED BY (fingerprint) SORTED BY (fingerprint) "
        f"INTO {buckets} BUCKETS LOCATION '{version_dir}'"
    )


def ensure_fingerprint_store(spark, store_path: str, buckets: int) -> str:
    """Open (or create) the bucketed fingerprint store rooted at
    ``store_path`` and return its catalog table name, ready for
    ``spark.table(name)`` reads of the BASE and
    :func:`append_fingerprints` delta writes (full membership is
    base ∪ delta — :func:`store_delta_frame` /
    :func:`read_store_fingerprints`).

    Restart-safe: the catalog is in-memory, so a fresh session
    re-registers the external table over the current complete version.
    A brand-new store writes an EMPTY bucketed v0 first (the bucketed
    write is what stamps ``_SUCCESS`` — an empty directory would be an
    incomplete version) and registers over it.

    .. warning:: SESSION-GLOBAL side effect. Opening a store sets
       ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` for
       the WHOLE session, which changes planning for every other
       bucketed-table scan in it: with the flag on, planning any
       bucketed scan lists its files to verify one-file-per-bucket
       (~``buckets`` names per store version here — cheap — but paid
       by unrelated bucketed tables too, and a many-files bucketed
       table elsewhere in the session pays a real listing). The store
       REQUIRES the flag: it is what lets the one-sorted-file-per-
       bucket base report its sort order so the merge join against it
       needs no store-side Sort — the property the immutable base
       exists for. The open fails loudly if the flag cannot be read
       back as ``true`` (an engine that drops this legacy knob would
       otherwise silently resurrect the per-batch store Sort; the
       executed-plan shape itself is pinned in
       tests/test_plans.py::test_bucketed_store_anti_join_shuffles_
       only_the_batch). If another workload in the session must run
       with the flag off, use separate sessions
       (``spark.newSession()`` shares the JVM but not the conf).

    ``buckets`` must match across every open of one store (it is the
    physical file layout); size it like any bucket count — fingerprint
    volume / ~256 MB per bucket file after compaction.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    _ORDER_FLAG = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(_ORDER_FLAG, "true")
    if str(spark.conf.get(_ORDER_FLAG, "false")).lower() != "true":
        # a future engine dropping/ignoring this legacy knob would
        # silently resurrect the per-batch store-side Sort the
        # base+delta design exists to elide — fail the open instead
        raise RuntimeError(
            f"{_ORDER_FLAG} could not be enabled on this session; the "
            "fingerprint store's sort-elided merge join depends on it "
            "(see ensure_fingerprint_store docstring)."
        )
    table = store_table_name(store_path)
    cur = current_store_version(spark, store_path)
    if cur is None:
        v0 = f"{store_path}/v0"
        (
            spark.createDataFrame([], "fingerprint string")
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(buckets, "fingerprint")
            .sortBy("fingerprint")
            .option("path", v0)
            .saveAsTable(table)
        )
        _write_store_meta(spark, store_path, buckets)
        return table
    _check_store_buckets(spark, store_path, buckets)
    want = f"{store_path}/v{cur}"

    def norm(p: str) -> str:
        # catalog locations print with a scheme and no authority
        # ("file:/tmp/x"); compare scheme-stripped paths
        return re.sub(r"^[A-Za-z][A-Za-z0-9+.-]*:(//)?", "", p).rstrip("/")

    loc = _table_location(spark, table)
    if loc is None or norm(loc) != norm(want):
        # fresh session, or the table survived a compaction crash still
        # pointing at the previous (now-deleted or stale) version
        _register_store_table(spark, table, want, buckets)
    return table


def append_fingerprints(df: DataFrame, store_path: str, buckets: int) -> None:
    """Append a fingerprint batch to the store's DELTA staging dir.

    The base version is immutable (one sorted file per bucket — the
    sort-elision property), so appends land as plain parquet files
    under ``<store_path>/delta/``: a constant
    ``_DELTA_FILES_PER_APPEND`` files per batch (round-robin, keeping
    the append's upstream parallelism), merged into the next base by
    :func:`compact_fingerprint_store`. Concurrent appenders are safe —
    each lands its own files, and the compactor only ever deletes the
    snapshot it merged. ``buckets`` is validated against the store's
    persisted layout (the same open-contract as every other entry
    point)."""
    spark = df.sparkSession
    _check_store_buckets(spark, store_path, buckets)
    # An all-duplicate micro-batch survives as an EMPTY frame; writing
    # it would land footer-only part files in delta/ that count toward
    # store_delta_file_count and trigger compactions merging no data.
    # The guard is a limit-1 probe — free in the streaming carrier,
    # where the batch is persisted and already materialized by the
    # output write that precedes the append. For an UNPERSISTED caller
    # frame (whose plan may hold anti-join shuffles), persist around
    # probe+write so the upstream chain runs once, not once for the
    # probe and again for the write; a caller's own persistence is
    # never touched (unpersisting their cache is not this function's
    # call).
    from pyspark import StorageLevel

    own_cache = df.storageLevel == StorageLevel.NONE
    if own_cache:
        df = df.persist()
    try:
        if df.isEmpty():
            return
        (
            df.select("fingerprint")
            .repartition(_DELTA_FILES_PER_APPEND)
            .write.mode("append")
            .parquet(f"{store_path}/delta")
        )
    finally:
        if own_cache:
            df.unpersist()


def _delta_files(spark, store_path: str) -> list:
    """Paths of the delta data files (driver-side listing, no job)."""
    fs, _, jvm = _store_fs(spark, store_path)
    ddir = jvm.org.apache.hadoop.fs.Path(f"{store_path}/delta")
    if not fs.exists(ddir):
        return []
    out = []
    for status in fs.listStatus(ddir):
        name = status.getPath().getName()
        if status.isFile() and not name.startswith(("_", ".")):
            out.append(str(status.getPath().toString()))
    return out


def store_table_version(spark, table: str) -> Optional[int]:
    """The store version a catalog ``table`` actually READS — parsed
    from its registered location's trailing ``v<k>`` segment (None for
    an unregistered table or a non-versioned location). This, not
    :func:`current_store_version`, is what a reader must pass as
    ``base_version`` to :func:`store_delta_frame`: a compaction by
    ANOTHER process re-points only its own in-memory catalog, so this
    session's table may legitimately still read the grace version
    while the store root already holds a newer one."""
    loc = _table_location(spark, table)
    if loc is None:
        return None
    m = re.search(r"/v(\d+)/?$", loc)
    return int(m.group(1)) if m else None


def store_delta_frame(
    spark, store_path: str, base_version: Optional[int] = None
) -> Optional[DataFrame]:
    """DataFrame over the store's delta files, or None when the delta
    is empty. Reads an explicit SNAPSHOT of file paths, so a
    concurrent append landing mid-read cannot fail the scan.

    ``base_version`` — the version number the caller's BASE scan reads
    (from :func:`store_table_version`; NOT a fresh
    :func:`current_store_version` call, which can race one version
    ahead of the registered table). When given, delta files recorded
    as merged into THAT version (its ``_merged_delta.json``) are
    excluded: their fingerprints are by construction contained in that
    base, so base ∪ delta is unchanged while the delta-side join input
    drops by the grace files — closing the one-cycle ≤2× delta read
    the grace design otherwise costs after every compaction.

    When ``base_version`` is None the full superset comes back —
    correct for ANY base version: for a reader still on the GRACE base
    the merged files are the difference between complete and
    silently-missing membership, and for a current-base reader they
    are a harmless superset (an anti-join can only suppress what the
    base suppresses anyway)."""
    files = _delta_files(spark, store_path)
    if base_version is not None and files:
        merged = _merged_manifest(spark, store_path, base_version)
        if merged:
            import posixpath

            files = [
                f for f in files if posixpath.basename(f) not in merged
            ]
    if not files:
        return None
    return spark.read.schema("fingerprint string").parquet(*files)


def read_store_fingerprints(spark, store_path: str, buckets: int) -> DataFrame:
    """Full membership view (base ∪ delta) as one deduplicated
    DataFrame — for consumers that want the SET, not the join shape
    (base and delta legitimately overlap for a grace cycle after every
    compaction, and after a swap-to-delete crash). Hot-path anti-joins
    should keep the two sides separate instead (base via
    ``spark.table``: exchange- and sort-elided; delta via
    :func:`store_delta_frame`: O(delta)) — a union collapses both into
    one unpartitioned, unsorted input."""
    table = ensure_fingerprint_store(spark, store_path, buckets)
    base = spark.table(table).select("fingerprint")
    delta = store_delta_frame(
        spark, store_path, base_version=store_table_version(spark, table)
    )
    if delta is None:
        return base
    return base.unionByName(delta).dropDuplicates(["fingerprint"])


def store_delta_file_count(spark, store_path: str) -> int:
    """UNMERGED delta data-file count — the compaction trigger signal
    (a driver-side listing, no job). Files already merged into the
    current base (lingering for their grace cycle) are discounted via
    the version's manifest: counting them would re-trigger a
    compaction immediately after every compaction. The base's file
    count is constant (one per bucket) between compactions, so
    unmerged delta growth IS the store's file growth."""
    import posixpath

    files = _delta_files(spark, store_path)
    if not files:
        return 0
    cur = current_store_version(spark, store_path)
    merged = (
        _merged_manifest(spark, store_path, cur) if cur is not None else set()
    )
    return sum(1 for f in files if posixpath.basename(f) not in merged)


def _read_lease(fs, jvm, lease) -> dict:
    """Parse a lease file into {holder, host, pid} — tolerant of the
    bare-appId format (hand-written or pre-r16 leases): missing fields
    come back None, and liveness then cannot be verified."""
    try:
        stream = fs.open(lease)
        raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        stream.close()
    except Exception:
        # same key set as the parsed form: break_compaction_lease reads
        # info['pidns']/info['ticks'] unconditionally, and an unreadable
        # lease must land in its documented 'unverifiable, pass force'
        # branch — not a KeyError
        return {
            "holder": "<unreadable>",
            "host": None,
            "pid": None,
            "pidns": None,
            "ticks": None,
        }
    parts = raw.split("\x1f")
    out = {
        "holder": parts[0] or "<empty>",
        "host": None,
        "pid": None,
        "pidns": None,
        "ticks": None,
    }
    if len(parts) >= 3:
        out["host"] = parts[1]
        try:
            out["pid"] = int(parts[2])
        except ValueError:
            pass
    if len(parts) >= 5:
        out["pidns"] = parts[3] or None
        try:
            out["ticks"] = int(parts[4])
        except ValueError:
            pass
    return out


def _pid_ns() -> "str | None":
    """This process's pid-namespace identity (``pid:[inode]``) — the
    property that makes a dead-pid conclusion TRANSFERABLE: two
    containers on one host share a hostname but never a pid namespace,
    so 'pid absent' observed from another namespace proves nothing.
    None where /proc is unavailable (non-Linux)."""
    import os as _os

    try:
        return _os.readlink("/proc/self/ns/pid")
    except OSError:
        return None


def _pid_start_ticks(pid: int) -> "int | None":
    """Kernel start time (clock ticks since boot) of ``pid`` — field
    22 of /proc/<pid>/stat, parsed after the last ')' so a comm with
    spaces or parens cannot shift fields. Distinguishes the recorded
    holder from a RECYCLED pid wearing the same number. None when the
    pid is gone or /proc is unavailable."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            raw = f.read()
        fields = raw[raw.rindex(b")") + 2:].split()
        # fields[0] is stat field 3 (state); start time is field 22
        return int(fields[19])
    except (OSError, ValueError, IndexError):
        return None


def break_compaction_lease(spark, store_path: str, force: bool = False) -> str:
    """Remove a crashed compactor's leftover ``_compaction_lease``
    AFTER verifying the holder is dead — the recovery path the
    compaction error message names (also ``tools/store_admin.py
    --break-lease``). Returns the evicted holder's description.

    The liveness check is mechanical where the conclusion is actually
    TRANSFERABLE: the lease records the compactor's pid, pid-NAMESPACE
    identity, and pid start time. Only when the breaker shares the
    holder's pid namespace is "pid absent" proof of death (two
    containers on one host share a hostname but never a pid namespace
    — a hostname match alone would break a LIVE compactor's lease from
    a sibling container); a present pid whose start time differs from
    the recorded one is a RECYCLED pid, also proof of death. A pid
    that is present with the recorded start time is the live holder —
    refused even with ``force``. Everything else (another namespace,
    another host, a hand-written or pre-r16 lease without
    namespace/ticks) is UNVERIFIABLE from here: refused unless
    ``force=True``, which the caller passes only after confirming
    out-of-band that no compaction job is running."""
    fs, _, jvm = _store_fs(spark, store_path)
    lease = jvm.org.apache.hadoop.fs.Path(f"{store_path}/_compaction_lease")
    if not fs.exists(lease):
        raise ValueError(
            f"no _compaction_lease under {store_path!r} — nothing to break"
        )
    info = _read_lease(fs, jvm, lease)
    desc = (
        f"{info['holder']} (host={info['host']}, pid={info['pid']}, "
        f"pidns={info['pidns']})"
    )
    verdict = "unknown"
    if (
        info["pid"] is not None
        and info["pidns"] is not None
        and info["pidns"] == _pid_ns()
    ):
        ticks = _pid_start_ticks(info["pid"])
        if ticks is None:
            verdict = "dead"  # same namespace, pid gone — conclusive
        elif info["ticks"] is not None and ticks != info["ticks"]:
            verdict = "dead"  # same number, different process (recycled)
        else:
            verdict = "alive"
    if verdict == "alive":
        raise RuntimeError(
            f"refusing to break the lease on {store_path!r}: holder "
            f"{desc} is STILL RUNNING (same pid namespace, matching "
            "start time). If that pid is not actually a compactor, "
            "stop it first."
        )
    if verdict == "unknown" and not force:
        raise RuntimeError(
            f"cannot verify liveness of lease holder {desc} from this "
            f"process (different or unrecorded pid namespace) — "
            "confirm no compaction job is running, then pass "
            "force=True (store_admin.py: --force)."
        )
    fs.delete(lease, False)
    return desc


def compact_fingerprint_store(
    spark,
    store_path: str,
    buckets: int,
    keep_grace: bool = True,
    force_break_lease: bool = False,
) -> str:
    """Merge the current base version with a SNAPSHOT of the delta
    files into the next version (one sorted file per bucket — the
    layout the sort-elided merge join needs), re-point the catalog
    table, then apply the GRACE-deferred cleanup: delete the delta
    files merged ONE CYCLE AGO (this version's snapshot is recorded in
    its ``_merged_delta.json`` and deleted by the NEXT compaction — a
    concurrent reader's in-flight delta scan therefore never races a
    delete, the same one-full-cycle grace the superseded base gets)
    and every version OLDER than the one just superseded. Returns the
    table name.

    ``keep_grace=False`` deletes the superseded version too — a
    known-single-reader deployment reclaims the between-compactions 2x
    disk footprint at the cost of the concurrent-reader grace window
    described below.

    Crash-safe by construction: the new version is complete (its
    ``_SUCCESS`` exists) before the table re-points, and version
    discovery ignores incomplete directories — a crash mid-write redoes
    the compaction; a crash between re-point and the delta delete
    leaves the merged fingerprints duplicated between base and delta —
    a SUPERSET of the true set, which only suppresses what it should
    suppress anyway, and the ``dropDuplicates`` below folds the copies
    on the next cycle; a crash before the version delete leaks
    directories that later compactions clean up (versions only grow).

    Concurrency contract: the version JUST superseded is kept as a
    GRACE version — a concurrent READER session whose catalog table
    still points at it keeps reading correct (one-cycle stale) data
    for a full compaction cycle, and its next
    ``ensure_fingerprint_store`` re-points it forward. Concurrent
    APPENDS are safe against compaction: the compactor merges and
    deletes only the delta files it LISTED at start, so an append
    racing the rewrite stays in delta for the next cycle — never lost
    (lifecycle-tested). Two concurrent COMPACTORS are excluded
    mechanically by a lease file (``_compaction_lease``, atomic
    create-if-absent): the second fails loudly naming the holder. A
    compactor that CRASHES mid-run leaves its lease behind, and later
    compactions fail with its contents until the lease is removed —
    by hand, by ``tools/store_admin.py --break-lease``, or by passing
    ``force_break_lease=True`` here; all three run
    :func:`break_compaction_lease`'s liveness check first (a holder
    still alive on this host refuses the break). Auto-expiring the
    lease would re-open the two-compactors race; a loud stop that
    names the dead owner beats a silent double-rewrite."""
    table = store_table_name(store_path)
    cur = current_store_version(spark, store_path)
    if cur is None:
        raise ValueError(f"no complete store version under {store_path!r}")
    _check_store_buckets(spark, store_path, buckets)
    fs, root, jvm = _store_fs(spark, store_path)
    lease = jvm.org.apache.hadoop.fs.Path(
        f"{store_path}/_compaction_lease"
    )
    if force_break_lease and fs.exists(lease):
        # force here means: break an UNVERIFIABLE lease too (the caller
        # has confirmed out-of-band that no compactor runs); a holder
        # verified alive still refuses inside break_compaction_lease
        break_compaction_lease(spark, store_path, force=True)
    try:
        # overwrite=False -> atomic create-if-absent on HDFS/local
        # (object stores without atomic create lose only this guard,
        # not correctness for the documented single-compactor flow)
        out = fs.create(lease, False)
    except Exception as create_err:
        # only report "already being compacted" when the lease actually
        # exists — a permission error, missing parent, or transient IO
        # failure must surface as ITSELF, not masquerade as a held lease
        if not fs.exists(lease):
            raise
        info = _read_lease(fs, jvm, lease)
        holder = (
            f"{info['holder']} (host={info['host']}, pid={info['pid']})"
        )
        raise RuntimeError(
            f"fingerprint store {store_path!r} is already being "
            f"compacted (lease holder: {holder}). If that compactor "
            "crashed, recover with tools/store_admin.py --break-lease "
            f"{store_path} (it verifies the holder is dead first) or "
            "compact_fingerprint_store(force_break_lease=True)."
        ) from create_err
    # from here the lease exists and MUST be released on any failure —
    # including a failed holder-id write, which would otherwise leak an
    # empty lease that wedges every later compaction
    try:
        try:
            import os as _os
            import socket as _socket

            out.write(
                bytearray(
                    # appId + host + pid + pid-namespace + start ticks:
                    # what break_compaction_lease needs to verify the
                    # holder's liveness mechanically (the namespace is
                    # what makes a dead-pid conclusion transferable;
                    # the start ticks catch pid recycling)
                    f"{spark.sparkContext.applicationId}\x1f"
                    f"{_socket.gethostname()}\x1f{_os.getpid()}\x1f"
                    f"{_pid_ns() or ''}\x1f"
                    f"{_pid_start_ticks(_os.getpid()) or ''}",
                    "utf-8",
                )
            )
        finally:
            out.close()
        return _compact_locked(spark, store_path, buckets, keep_grace, cur)
    finally:
        fs.delete(lease, False)


def _merged_manifest(spark, store_path: str, version: int) -> set:
    """Delta file NAMES recorded as merged into ``v<version>`` (empty
    when the version has no manifest — pre-deferral compactions)."""
    import json as _json

    fs, _, jvm = _store_fs(spark, store_path)
    p = jvm.org.apache.hadoop.fs.Path(
        f"{store_path}/v{version}/_merged_delta.json"
    )
    if not fs.exists(p):
        return set()
    stream = fs.open(p)
    try:
        raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return set(_json.loads(raw))


def _compact_locked(
    spark, store_path: str, buckets: int, keep_grace: bool, cur: int
) -> str:
    import json as _json
    import posixpath

    table = store_table_name(store_path)
    nxt = f"{store_path}/v{cur + 1}"
    tmp_table = f"{table}_compacting"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    # snapshot the delta BEFORE reading: exactly these files are
    # merged; files appended during the rewrite are untouched and
    # survive into the next cycle
    delta_snapshot = _delta_files(spark, store_path)
    # read the RAW base files, not spark.table(): a bucketed-table read
    # reports HashPartitioning and lets Catalyst elide the repartition
    # below — while the physical scan may still use plain file splits
    # that straddle buckets (autoBucketedScan), which would fan each
    # writer task across several buckets and DOUBLE the file count the
    # compaction exists to shrink
    merged = spark.read.schema("fingerprint string").parquet(
        f"{store_path}/v{cur}", *delta_snapshot
    )
    # dropDuplicates AFTER the repartition reuses its HashPartitioning
    # (no second exchange) and folds the base∪delta overlap a crash
    # between an earlier swap and delta delete would have left behind
    (
        merged.repartition(buckets, F.col("fingerprint"))
        .dropDuplicates(["fingerprint"])
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "fingerprint")
        .sortBy("fingerprint")
        .option("path", nxt)
        .saveAsTable(tmp_table)
    )
    spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    fs, root, jvm = _store_fs(spark, store_path)
    # record WHAT this version absorbed before anyone can read it as
    # current: the snapshot files get the same one-full-cycle GRACE as
    # the superseded base (deleted by the NEXT compaction, below) so a
    # concurrent reader's in-flight delta scan never races a delete —
    # until then they are a harmless base∪delta superset, and the
    # trigger (store_delta_file_count) discounts them via this manifest
    names = [posixpath.basename(f) for f in delta_snapshot]
    man = fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{nxt}/_merged_delta.json"), True
    )
    try:
        man.write(bytearray(_json.dumps(names), "utf-8"))
    finally:
        man.close()
    _register_store_table(spark, table, nxt, buckets)
    # delete the delta files merged ONE CYCLE AGO (recorded in the
    # superseded version's manifest — they have been in a live base
    # for a full compaction cycle); a racing append's unmerged file is
    # in neither manifest and always survives
    aged = _merged_manifest(spark, store_path, cur)
    if not keep_grace:
        aged = aged | set(names)  # no grace anywhere in this mode
    for name in aged:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(f"{store_path}/delta/{name}"),
            False,
        )
    # keep v{cur} as the grace version for concurrent readers (unless
    # keep_grace=False); delete everything older (incl. directories
    # leaked by earlier crashes)
    keep_from = cur if keep_grace else cur + 1
    for status in fs.listStatus(root):
        m = re.fullmatch(r"v(\d+)", status.getPath().getName())
        if m and int(m.group(1)) < keep_from:
            fs.delete(status.getPath(), True)
    return table
