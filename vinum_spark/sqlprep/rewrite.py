"""Dialect/semantics rewrites applied before ``spark.sql``.

Each rewrite reproduces a reference behavior that Spark SQL does not share:

- vinum builtin functions (``vinum/core/functions.py:353-387``) that have a
  different name or shape in Spark (``to_int`` → CAST, ``from_timestamp`` →
  ``timestamp_seconds``, …);
- ``np.<fn>(...)`` callable directly from SQL
  (``vinum/core/udf.py:46-54``) — rewritten to a flat registered name
  ``np_<fn>`` and reported to the caller for lazy pandas_udf registration;
- ``expr = NULL`` / ``!= NULL`` → ``IS [NOT] NULL``
  (``vinum/parser/parser.py:143-146``);
- pg ``#`` xor → Spark ``^`` (``vinum/parser/parser.py:77-80``);
- ``||`` / ``concat()`` casting every argument to string with Python
  ``str(None) == 'None'`` semantics (``vinum/core/functions.py:250-276``).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Set, Tuple

from vinum_spark.sqlprep.tokens import (
    KIND_IDENT,
    KIND_NUMBER,
    KIND_OP,
    KIND_QIDENT,
    KIND_STRING,
    Token,
    match_paren,
    render,
    split_top_level,
    tokenize,
)

# ---------------------------------------------------------------------------
# Function templates. Each maps (rewritten_args) -> SQL string.
# ---------------------------------------------------------------------------


def _cast_tpl(sql_type: str) -> Callable[[List[str]], str]:
    def tpl(args: List[str]) -> str:
        if len(args) == 1:
            return f"CAST({args[0]} AS {sql_type})"
        # Variadic form builds an array of casted values
        # (vinum/core/functions.py:148-165: args become a column).
        inner = ", ".join(f"CAST({a} AS {sql_type})" for a in args)
        return f"ARRAY({inner})"

    return tpl


def _date_tpl(args: List[str]) -> str:
    if args and args[0].strip().upper() in ("'NOW'", "'TODAY'"):
        return "CURRENT_DATE()"
    return f"TO_DATE({args[0]})"


def _datetime_tpl(args: List[str]) -> str:
    # Optional unit arg controls sub-second resolution in the reference
    # (vinum/core/functions.py:56-89); Spark timestamps are always micros.
    a = args[0].strip()
    if a.upper() == "'NOW'":
        return "CURRENT_TIMESTAMP()"
    return f"CAST({a} AS TIMESTAMP)"


def _from_timestamp_tpl(args: List[str]) -> str:
    unit = args[1].strip().strip("'\"").lower() if len(args) > 1 else "s"
    fn = {
        "s": "TIMESTAMP_SECONDS",
        "ms": "TIMESTAMP_MILLIS",
        "us": "TIMESTAMP_MICROS",
    }.get(unit, "TIMESTAMP_SECONDS")
    return f"{fn}({args[0]})"


_TIMEDELTA_UNIT = {
    "w": "0,0,({n}),0,0,0,0",
    "d": "0,0,0,({n}),0,0,0",
    "h": "0,0,0,0,({n}),0,0",
    "m": "0,0,0,0,0,({n}),0",
    "s": "0,0,0,0,0,0,({n})",
    "y": "({n}),0,0,0,0,0,0",
}


def _timedelta_tpl(args: List[str]) -> str:
    n = args[0]
    unit = args[1].strip().strip("'\"").lower() if len(args) > 1 else "s"
    if unit == "m":
        # numpy 'm' = minutes; 'M' (months) arrives lowercased identically —
        # the reference distinguishes case, we follow numpy minutes for 'm'.
        pass
    slots = _TIMEDELTA_UNIT.get(unit, _TIMEDELTA_UNIT["s"]).format(n=n)
    return f"MAKE_INTERVAL({slots})"


def _is_busday_tpl(args: List[str]) -> str:
    # np.is_busday: Mon..Fri. Spark WEEKDAY: Monday=0..Sunday=6.
    return f"(WEEKDAY({args[0]}) <= 4)"


def _concat_tpl(args: List[str]) -> str:
    # vinum concat casts every arg via Python str(), so NULL -> 'None'
    # (vinum/core/functions.py:250-276, test_query_results.py:1303-1327).
    inner = ", ".join(f"COALESCE(CAST({a} AS STRING), 'None')" for a in args)
    return f"CONCAT({inner})"


def _now_tpl(args: List[str]) -> str:
    # Reference now() is seconds-resolution (vinum/core/functions.py:25-38).
    return "DATE_TRUNC('second', CURRENT_TIMESTAMP())"


_FUNCTION_TEMPLATES: Dict[str, Callable[[List[str]], str]] = {
    "to_int": _cast_tpl("BIGINT"),
    "to_float": _cast_tpl("DOUBLE"),
    "to_str": _cast_tpl("STRING"),
    "to_bool": _cast_tpl("BOOLEAN"),
    "date": _date_tpl,
    "datetime": _datetime_tpl,
    "from_timestamp": _from_timestamp_tpl,
    "timedelta": _timedelta_tpl,
    "is_busday": _is_busday_tpl,
    "concat": _concat_tpl,
    "now": _now_tpl,
    # power/log/log2/log10/abs/sqrt/cos/sin/tan/pi/e/upper/lower are
    # native Spark SQL functions with matching semantics — no rewrite.
}


def rewrite_sql(
    sql: str, udf_names: Set[str] | None = None
) -> Tuple[str, Set[Tuple[str, int]]]:
    """Apply all pre-pass rewrites.

    Returns ``(rewritten_sql, numpy_functions_used)`` where the second
    element is a set of ``(dotted_np_name, arity)`` pairs that must be
    registered as pandas UDFs (under flat names ``np_<fn>``) before
    execution.

    ``udf_names``: names registered via register_python/register_numpy —
    excluded from builtin templating so user UDFs win (the reference lets
    re-registration shadow builtins, ``vinum/core/udf.py:11-25``).
    """
    tokens = tokenize(sql)
    np_funcs: Set[Tuple[str, int]] = set()
    tokens = _rewrite_null_comparisons(tokens)
    tokens = _rewrite_xor(tokens)
    tokens = _rewrite_concat_operator(tokens)
    out_sql = _rewrite_functions(tokens, np_funcs, udf_names or set())
    return out_sql, np_funcs


def _rewrite_xor(tokens: List[Token]) -> List[Token]:
    return [Token(KIND_OP, "^") if t.text == "#" else t for t in tokens]


_CMP_EQ = {"="}
_CMP_NE = {"!=", "<>"}


def _rewrite_null_comparisons(tokens: List[Token]) -> List[Token]:
    """``x = NULL`` → ``x IS NULL``; ``x != NULL`` → ``x IS NOT NULL``.

    Handles the reversed form ``NULL = x`` as well.
    """
    out: List[Token] = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        nxt = tokens[i + 1] if i + 1 < n else None
        nxt2 = tokens[i + 2] if i + 2 < n else None
        # NULL = expr  /  NULL != expr → rewrite after the operand: hard to
        # find operand end; handle the common prefix form by swapping.
        if (
            t.kind == KIND_OP
            and (t.text in _CMP_EQ or t.text in _CMP_NE)
            and nxt is not None
            and nxt.is_kw("NULL")
        ):
            out.append(Token(KIND_IDENT, "IS"))
            if t.text in _CMP_NE:
                out.append(Token(KIND_IDENT, "NOT"))
            out.append(Token(KIND_IDENT, "NULL"))
            i += 2
            continue
        out.append(t)
        i += 1
    return out


def _is_primary_end(tokens: List[Token], i: int) -> int:
    """Given index of a token that ends a primary expression (ident, literal,
    or ``)``), return the start index of that primary (inclusive)."""
    t = tokens[i]
    if t.text == ")":
        depth = 0
        j = i
        while j >= 0:
            if tokens[j].text == ")":
                depth += 1
            elif tokens[j].text == "(":
                depth -= 1
                if depth == 0:
                    # include preceding function name if present
                    if j > 0 and tokens[j - 1].kind == KIND_IDENT:
                        return j - 1
                    return j
            j -= 1
        return 0
    return i


def _rewrite_concat_operator(tokens: List[Token]) -> List[Token]:
    """Fold ``a || b || c`` into ``concat(a, b, c)`` (then the concat
    template applies the None-cast semantics)."""
    while True:
        idx = next((i for i, t in enumerate(tokens) if t.text == "||"), None)
        if idx is None:
            return tokens
        # Left operand
        lstart = _is_primary_end(tokens, idx - 1)
        operands: List[List[Token]] = [tokens[lstart:idx]]
        i = idx
        while i < len(tokens) and tokens[i].text == "||":
            # Right operand: primary starting at i+1
            j = i + 1
            if j < len(tokens) and tokens[j].kind == KIND_IDENT and j + 1 < len(
                tokens
            ) and tokens[j + 1].text == "(":
                end = match_paren(tokens, j + 1)
            elif j < len(tokens) and tokens[j].text == "(":
                end = match_paren(tokens, j)
            else:
                end = j
            operands.append(tokens[j : end + 1])
            i = end + 1
        new: List[Token] = [Token(KIND_IDENT, "concat"), Token(KIND_OP, "(")]
        for k, op in enumerate(operands):
            if k:
                new.append(Token(KIND_OP, ","))
            new.extend(op)
        new.append(Token(KIND_OP, ")"))
        tokens = tokens[:lstart] + new + tokens[i:]


_SQL_KEYWORDS_NOT_FUNCTIONS = {
    "AND", "OR", "NOT", "IN", "AS", "ON", "BY", "FROM", "WHERE", "GROUP",
    "HAVING", "ORDER", "LIMIT", "OFFSET", "SELECT", "DISTINCT", "BETWEEN",
    "LIKE", "IS", "NULL", "CASE", "WHEN", "THEN", "ELSE", "END", "JOIN",
    "UNION", "EXCEPT", "INTERSECT", "ALL", "EXISTS", "OVER", "PARTITION",
    "VALUES", "INTERVAL",
}


def _rewrite_functions(
    tokens: List[Token], np_funcs: Set[Tuple[str, int]], udf_names: Set[str]
) -> str:
    """Recursively rewrite function calls via templates / np.* flattening."""

    def walk(toks: List[Token]) -> str:
        parts: List[Token] = []
        i = 0
        while i < len(toks):
            t = toks[i]
            is_call = (
                t.kind == KIND_IDENT
                and i + 1 < len(toks)
                and toks[i + 1].text == "("
                and t.upper() not in _SQL_KEYWORDS_NOT_FUNCTIONS
            )
            if is_call:
                close = match_paren(toks, i + 1)
                inner = toks[i + 2 : close]
                args = [
                    walk(a) for a in split_top_level(inner) if a
                ]  # recursively rewritten arg strings
                name = t.text
                lname = name.lower()
                if lname.startswith("np."):
                    flat = "np_" + lname[3:].replace(".", "_")
                    np_funcs.add((lname, len(args)))
                    rendered = f"{flat}({', '.join(args)})"
                elif lname in udf_names:
                    rendered = f"{lname}({', '.join(args)})"
                elif lname in _FUNCTION_TEMPLATES:
                    rendered = _FUNCTION_TEMPLATES[lname](args)
                else:
                    inner_sql = render(inner) if not args else ", ".join(args)
                    # DISTINCT/star etc. inside aggregate calls: render raw.
                    if any(tok.is_kw("DISTINCT") for tok in inner) or any(
                        tok.text == "*" for tok in inner
                    ):
                        inner_sql = render(inner)
                    rendered = f"{name}({inner_sql})"
                parts.append(Token(KIND_IDENT, rendered))
                i = close + 1
                continue
            parts.append(t)
            i += 1
        return render(parts)

    return walk(tokens)
