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
    if convert_options is not None:
        include_columns = list(getattr(convert_options, "include_columns", None) or []) or None
        ct = getattr(convert_options, "column_types", None)
        if ct:
            column_types = dict(ct)
        nulls = list(getattr(convert_options, "null_values", None) or [])
        extra_nulls: List[str] = []
        if nulls and nulls != _pyarrow_default_null_values():
            # Spark's CSV source accepts ONE nullValue sentinel; the
            # first custom sentinel maps onto it and the rest are applied
            # post-scan (sentinel→NULL on string columns, then a
            # single-pass type re-inference so a column whose only
            # blocker was a sentinel still comes out numeric, matching
            # pyarrow's sentinels-before-inference ordering).
            options.setdefault("nullValue", nulls[0])
            extra_nulls = [n for n in nulls[1:] if n != nulls[0]]
    else:
        extra_nulls = []

    reader = (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", str(infer_schema).lower())
        .option("sep", delimiter)
    )
    schema = options.pop("schema", None)
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
    if extra_nulls:
        df = _apply_null_sentinels(df, extra_nulls, reinfer=infer_schema)
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
    lines = (
        spark.sparkContext.textFile(path)
        .zipWithIndex()
        .filter(lambda li: li[1] >= skip_rows)
        .map(lambda li: li[0])
    )
    return reader.csv(lines)


def _apply_null_sentinels(df, sentinels, reinfer: bool):
    """Rewrite custom null sentinels to NULL post-scan, then (optionally)
    re-infer types in ONE aggregate pass.

    pyarrow applies ``null_values`` before type inference; Spark's single
    ``nullValue`` cannot. A column whose cells are e.g. ``1, 2, NA``
    therefore arrives as *string*. After the sentinel→NULL rewrite, a
    single ``agg`` computes, per string column, whether every surviving
    value parses as bigint / double / boolean, and casts accordingly —
    one extra scan, the same cost class as ``inferSchema`` itself.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    str_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    if not str_cols:
        return df
    sent = list(sentinels)
    for c in str_cols:
        df = df.withColumn(
            c, F.when(F.col(c).isin(sent), F.lit(None)).otherwise(F.col(c))
        )
    if not reinfer:
        return df
    aggs = []
    for i, c in enumerate(str_cols):
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"__s{i}_n"),
            F.count(col.try_cast("bigint")).alias(f"__s{i}_i"),
            F.count(col.try_cast("double")).alias(f"__s{i}_d"),
            F.count(F.when(F.lower(col).isin("true", "false"), 1)).alias(
                f"__s{i}_b"
            ),
        ]
    row = df.agg(*aggs).collect()[0]
    for i, c in enumerate(str_cols):
        n = row[f"__s{i}_n"]
        if n == 0:
            continue
        if row[f"__s{i}_i"] == n:
            df = df.withColumn(c, F.col(c).cast("bigint"))
        elif row[f"__s{i}_d"] == n:
            df = df.withColumn(c, F.col(c).cast("double"))
        elif row[f"__s{i}_b"] == n:
            df = df.withColumn(c, F.col(c).cast("boolean"))
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
    spark = spark or get_spark()
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    paths = [path] if isinstance(path, str) else list(path)
    df = reader.parquet(*paths)
    if columns:
        df = df.select(*columns)
    if filters:
        for col, op, val in filters:
            df = df.filter(_filter_expr(col, op, val))
    return Table(df)


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
