"""Eager/streaming readers (reference: ``vinum/io/arrow.py``).

All readers return a :class:`Table` over a lazy Spark scan — column
pruning, predicate pushdown, and partition pruning are applied by
Catalyst from whatever SQL runs on top. Compressed inputs (.gz/.bz2)
are handled natively by Spark's text-based sources.

Scale notes: a scan is split into ``spark.sql.files.maxPartitionBytes``
tasks; on 100 TB that's the whole parallelization story — no code here
needs to change.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple, Union

from pyspark.sql import SparkSession

from vinum_spark.api.stream_reader import StreamReader
from vinum_spark.api.table import Table
from vinum_spark.session import get_spark


def read_csv(
    path: str,
    read_options=None,
    parse_options=None,
    convert_options=None,
    memory_pool=None,
    *,
    header: bool = True,
    infer_schema: bool = True,
    delimiter: str = ",",
    spark: Optional[SparkSession] = None,
    **options,
) -> Table:
    """CSV → Table, reference-signature compatible
    (``vinum/io/arrow.py:64-108``): the 2nd–5th positional parameters
    accept ``pyarrow.csv.ReadOptions`` / ``ParseOptions`` /
    ``ConvertOptions`` / ``memory_pool`` exactly as the reference does,
    so a first-port call like ``read_csv(path, ro, po, co)`` works
    unchanged. Option-object fields are lowered onto the Spark CSV
    source:

    - ``ParseOptions``: delimiter → ``sep``, quote_char → ``quote``,
      escape_char → ``escape``, newlines_in_values → ``multiLine``;
    - ``ReadOptions``: skip_rows → the first N physical lines of the
      (single) input file are dropped before header parsing, exactly
      pyarrow's semantics (line-indexed text read; single plain file
      only, incompatible with ``newlines_in_values`` — both fail
      loudly); column_names / autogenerate_column_names → rename after
      a headerless read (pyarrow's ``f0..fN`` convention);
    - ``ConvertOptions``: include_columns → projection, column_types →
      post-scan casts, null_values → ``nullValue`` for the first
      sentinel plus a post-scan sentinel→NULL rewrite and single-pass
      type re-inference for the rest (pyarrow applies sentinels BEFORE
      inference; the re-inference pass restores that ordering).

    ``memory_pool`` is accepted and ignored — allocation is the JVM's
    concern here. Keyword use (``header=``, ``delimiter=``, raw Spark
    ``**options``) is unchanged. ``inferSchema`` triggers an extra pass
    — acceptable for ad-hoc use; pass an explicit ``schema=`` at scale.
    """
    spark = spark or get_spark()
    # the pre-parity API took header/infer_schema/delimiter positionally;
    # a stale positional call like read_csv(path, False) would otherwise
    # bind onto read_options and silently read with the wrong header mode
    for arg, name in (
        (read_options, "read_options"),
        (parse_options, "parse_options"),
        (convert_options, "convert_options"),
    ):
        if arg is not None and isinstance(arg, (bool, str, int, float)):
            raise TypeError(
                f"{name} must be a pyarrow.csv option object (got "
                f"{type(arg).__name__}); header/infer_schema/delimiter "
                "are keyword-only"
            )
    column_names = None
    autogenerate = False
    skip_rows = 0
    if read_options is not None:
        skip_rows = int(getattr(read_options, "skip_rows", 0) or 0)
        column_names = list(getattr(read_options, "column_names", None) or []) or None
        autogenerate = bool(getattr(read_options, "autogenerate_column_names", False))
        enc = getattr(read_options, "encoding", None)
        if enc and enc != "utf8":
            options.setdefault("encoding", enc)
        if column_names or autogenerate:
            header = False
    if parse_options is not None:
        delimiter = getattr(parse_options, "delimiter", None) or delimiter
        quote = getattr(parse_options, "quote_char", None)
        if isinstance(quote, str):
            options.setdefault("quote", quote)
        esc = getattr(parse_options, "escape_char", None)
        if isinstance(esc, str):
            options.setdefault("escape", esc)
        if getattr(parse_options, "newlines_in_values", False):
            options.setdefault("multiLine", "true")
    include_columns = None
    column_types = None
    extra_nulls: List[str] = []
    strings_can_be_null = False
    if convert_options is not None:
        include_columns = list(getattr(convert_options, "include_columns", None) or []) or None
        ct = getattr(convert_options, "column_types", None)
        if ct:
            column_types = dict(ct)
        strings_can_be_null = bool(
            getattr(convert_options, "strings_can_be_null", False)
        )
        nulls = list(getattr(convert_options, "null_values", None) or [])
        if nulls and nulls != _pyarrow_default_null_values():
            if strings_can_be_null:
                # every column may null the sentinels: Spark's single
                # nullValue option (applied to all columns at scan time)
                # takes the first sentinel; the rest go post-scan.
                options.setdefault("nullValue", nulls[0])
                extra_nulls = [n for n in nulls[1:] if n != nulls[0]]
            else:
                # pyarrow's default: sentinels null only during
                # conversion to NON-string types; a genuine string
                # column keeps them literal. Spark's nullValue can't
                # express that (it nulls string columns too), so ALL
                # sentinels are applied post-scan, and only to columns
                # the re-inference pass retypes away from string.
                extra_nulls = list(dict.fromkeys(nulls))

    schema = options.pop("schema", None)
    # A column explicitly pinned to STRING must keep its raw text
    # (leading zeros!). Spark's inferSchema is all-or-nothing — it
    # would parse '01' into int 1 BEFORE any cast could save it — so
    # when such a pin exists the scan reads everything as text and the
    # re-inference pass (extended with date/timestamp) retypes the
    # unpinned columns instead, mirroring pyarrow's per-column
    # authority.
    pinned_string = schema is None and any(
        str(t) in ("string", "large_string")
        for t in (column_types or {}).values()
    )
    scan_infer = infer_schema and not pinned_string
    reader = (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", str(scan_infer).lower())
        .option("sep", delimiter)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    if skip_rows:
        df = _read_csv_skipping(spark, reader, path, skip_rows, options)
    else:
        df = reader.csv(path)
    if column_names:
        df = df.toDF(*column_names)
    elif autogenerate:
        df = df.toDF(*[f"f{i}" for i in range(len(df.columns))])
    if column_types:
        from pyspark.sql import functions as F

        for name, pa_type in column_types.items():
            if name in df.columns:
                spark_type = _PA_TO_SPARK.get(str(pa_type))
                if spark_type:
                    df = df.withColumn(name, F.col(name).cast(spark_type))
    if extra_nulls or (pinned_string and infer_schema):
        # explicit types are authoritative: never re-infer over schema=
        # or over ConvertOptions.column_types entries (a column declared
        # string — zero-padded codes — must stay string, matching
        # pyarrow); sentinel rewriting still applies per
        # strings_can_be_null. When the scan was forced to plain text
        # by a string pin, this pass also performs the type inference
        # the scan skipped for the unpinned columns.
        df = _apply_null_sentinels(
            df,
            extra_nulls,
            reinfer=infer_schema and schema is None,
            strings_can_be_null=strings_can_be_null,
            pinned_cols=frozenset(column_types or ()),
        )
    if include_columns:
        df = df.select(*include_columns)
    return Table(df)


def _read_csv_skipping(spark, reader, path: str, skip_rows: int, options):
    """pyarrow ``ReadOptions.skip_rows`` semantics: drop the first N
    physical lines of the file, THEN parse (header line included in what
    remains). Spark's CSV source has no skipRows option, so the file is
    read as ordered text (``textFile`` + ``zipWithIndex`` — intra-file
    line order is contractual there) and the surviving lines are fed to
    the same CSV parser. This is the one deliberate RDD use in the
    readers: a per-line positional filter is imperative by nature.
    Single plain file only (skip-N-lines is not well-defined across a
    multi-file glob), and incompatible with ``newlines_in_values``
    (quoted embedded newlines break line-oriented splitting).
    """
    import os

    if any(c in path for c in "*?[]{}") or os.path.isdir(path):
        raise NotImplementedError(
            "read_options.skip_rows supports a single plain file only "
            f"(got {path!r}); pre-slice multi-file inputs instead"
        )
    if str(options.get("multiLine", "")).lower() == "true":
        raise NotImplementedError(
            "read_options.skip_rows cannot be combined with "
            "parse_options.newlines_in_values: skipping is line-oriented "
            "while quoted values may embed newlines"
        )
    enc = str(options.get("encoding", "utf8")).lower().replace("-", "")
    if enc not in ("utf8", "ascii"):
        # textFile always decodes UTF-8; silently misdecoding the bytes
        # would be worse than refusing
        raise NotImplementedError(
            "read_options.skip_rows supports utf-8 input only (got "
            f"encoding={options['encoding']!r}); re-encode the file or "
            "pre-slice it instead"
        )
    # Caveat (documented divergence): Spark's Dataset[String] CSV path
    # drops EVERY line byte-equal to the header, not just the first —
    # a data row that exactly repeats the header line is lost here,
    # unlike the plain file-path read.
    lines = (
        spark.sparkContext.textFile(path)
        .zipWithIndex()
        .filter(lambda li: li[1] >= skip_rows)
        .map(lambda li: li[0])
    )
    return reader.csv(lines)


def _apply_null_sentinels(
    df,
    sentinels,
    reinfer: bool,
    strings_can_be_null: bool = True,
    pinned_cols: frozenset = frozenset(),
):
    """Rewrite custom null sentinels to NULL post-scan, then (optionally)
    re-infer types in ONE aggregate pass.

    pyarrow applies ``null_values`` before type inference; Spark's single
    ``nullValue`` cannot. A column whose cells are e.g. ``1, 2, NA``
    therefore arrives as *string*. A single ``agg`` computes, per string
    column, whether every non-sentinel value parses as bigint / double /
    boolean — one extra scan, the same cost class as ``inferSchema``.

    ``strings_can_be_null`` mirrors pyarrow's ConvertOptions flag: when
    False (pyarrow's default) sentinels become NULL only in columns the
    re-inference pass retypes AWAY from string — a genuine string column
    keeps them as literal values, exactly as pyarrow's converter does.
    When True, every string column nulls the sentinels.

    ``pinned_cols`` (columns explicitly typed by the caller via
    ``ConvertOptions.column_types``) are exempt from re-inference — an
    explicitly-string column must keep its leading zeros — but still
    honor ``strings_can_be_null`` for sentinel nulling, matching
    pyarrow's converter.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    str_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, StringType) and f.name not in pinned_cols
    ]
    pinned_str = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, StringType) and f.name in pinned_cols
    ]
    if not str_cols and not pinned_str:
        return df
    sent = list(sentinels)

    def nulled(c):
        return F.when(F.col(c).isin(sent), F.lit(None)).otherwise(F.col(c))

    retyped = {}
    if reinfer and str_cols:
        aggs = []
        for i, c in enumerate(str_cols):
            col = nulled(c)  # sentinels-before-inference, pyarrow's order
            aggs += [
                F.count(col).alias(f"__s{i}_n"),
                F.count(col.try_cast("bigint")).alias(f"__s{i}_i"),
                F.count(col.try_cast("double")).alias(f"__s{i}_d"),
                F.count(F.when(F.lower(col).isin("true", "false"), 1)).alias(
                    f"__s{i}_b"
                ),
                # date/timestamp matter when a string pin forced the
                # whole scan to plain text (scan-level inference off)
                F.count(col.try_cast("date")).alias(f"__s{i}_dt"),
                F.count(col.try_cast("timestamp")).alias(f"__s{i}_ts"),
            ]
        row = df.agg(*aggs).collect()[0]
        for i, c in enumerate(str_cols):
            n = row[f"__s{i}_n"]
            if n == 0:
                continue
            if row[f"__s{i}_i"] == n:
                retyped[c] = "bigint"
            elif row[f"__s{i}_d"] == n:
                retyped[c] = "double"
            elif row[f"__s{i}_b"] == n:
                retyped[c] = "boolean"
            elif row[f"__s{i}_dt"] == n:
                retyped[c] = "date"
            elif row[f"__s{i}_ts"] == n:
                retyped[c] = "timestamp"
    for c in str_cols:
        if strings_can_be_null:
            df = df.withColumn(c, nulled(c))
        elif c in retyped:
            df = df.withColumn(c, nulled(c))
    # explicitly-typed string columns: sentinels null only under
    # strings_can_be_null; the declared type itself is never touched
    if strings_can_be_null:
        for c in pinned_str:
            df = df.withColumn(c, nulled(c))
    for c, t in retyped.items():
        df = df.withColumn(c, F.col(c).cast(t))
    return df


def _pyarrow_default_null_values() -> list:
    """pyarrow's stock ConvertOptions.null_values — customized lists are
    distinguished from the untouched default."""
    try:
        import pyarrow.csv as pacsv

        return list(pacsv.ConvertOptions().null_values)
    except ImportError:  # pragma: no cover
        return []


# pyarrow type name → Spark SQL type for ConvertOptions.column_types
_PA_TO_SPARK = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bool": "boolean",
    "date32[day]": "date",
    "timestamp[s]": "timestamp",
    "timestamp[ms]": "timestamp",
    "timestamp[us]": "timestamp",
}


def stream_csv(path: str, spark: Optional[SparkSession] = None, **options) -> StreamReader:
    """Streaming CSV (reference: ``vinum/io/arrow.py:9-61``). On Spark the
    eager and streaming readers are the same partitioned scan; this exists
    for API parity and returns a :class:`StreamReader`."""
    tbl = read_csv(path, spark=spark, **options)
    return StreamReader(tbl.df)


def read_json(path: str, spark: Optional[SparkSession] = None, **options) -> Table:
    """Line-delimited JSON → Table (reference: ``vinum/io/arrow.py:111-148``)."""
    spark = spark or get_spark()
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return Table(reader.json(path))


def read_parquet(
    path: Union[str, Sequence[str]],
    columns: Optional[List[str]] = None,
    filters: Optional[Iterable[Tuple]] = None,
    spark: Optional[SparkSession] = None,
    **options,
) -> Table:
    """Parquet → Table (reference: ``vinum/io/arrow.py:151-248``).

    ``columns``/``filters`` mirror the reference's pyarrow passthrough
    args; on Spark they lower to projection + filter expressions, which
    Catalyst pushes into the scan (verify with ``PushedFilters`` in
    ``df.explain``). Hive-style partition discovery is automatic.
    """
    return _read_with_pushdown("parquet", path, columns, filters, spark, options)


def _read_with_pushdown(fmt, path, columns, filters, spark, options) -> Table:
    """Shared lowering for the columnar formats (parquet/orc): reader
    options, path normalization, then columns/filters as projection +
    filter expressions Catalyst pushes into the scan. One body so a fix
    to the lowering can never diverge between formats."""
    spark = spark or get_spark()
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    paths = [path] if isinstance(path, str) else list(path)
    df = getattr(reader, fmt)(*paths)
    if columns:
        df = df.select(*columns)
    if filters:
        for col, op, val in filters:
            df = df.filter(_filter_expr(col, op, val))
    return Table(df)


def read_orc(
    path: Union[str, Sequence[str]],
    columns: Optional[List[str]] = None,
    filters: Optional[Iterable[Tuple]] = None,
    spark: Optional[SparkSession] = None,
    **options,
) -> Table:
    """ORC -> Table. Beyond the reference's surface (csv/json/parquet,
    ``vinum/io/arrow.py``) but shares :func:`read_parquet`'s contract:
    ``columns``/``filters`` lower to projection + filter expressions
    that Catalyst pushes into the ORC scan (predicate pushdown +
    column pruning are native for ORC like parquet); hive-style
    partition discovery is automatic.
    """
    return _read_with_pushdown("orc", path, columns, filters, spark, options)


def _filter_expr(col: str, op: str, val):
    from pyspark.sql import functions as F

    c = F.col(col)
    ops = {
        "=": c.__eq__,
        "==": c.__eq__,
        "!=": c.__ne__,
        "<": c.__lt__,
        "<=": c.__le__,
        ">": c.__gt__,
        ">=": c.__ge__,
    }
    if op in ops:
        return ops[op](val)
    if op == "in":
        return c.isin(list(val))
    if op == "not in":
        return ~c.isin(list(val))
    raise ValueError(f"unsupported filter op: {op}")
