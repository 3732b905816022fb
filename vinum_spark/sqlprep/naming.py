"""Output column-naming contract.

Replicates the reference's select-list name synthesis
(``vinum/planner/planner.py:290-328`` + ``vinum/parser/parser.py:210-211``
+ ``vinum/parser/query.py:279-285``):

- explicit alias wins;
- a bare column reference keeps its column name;
- a function-call expression is named after the function
  (``np.log(x)`` → ``np.log``; ``count(*)`` → ``count_star``);
- anything else becomes ``col_<n>`` (n counts unnamed expressions);
- duplicate names get ``_<k>`` suffixes in select-list order
  (two ``sum(x)`` columns → ``sum``, ``sum_1``).
"""

from __future__ import annotations

from typing import List, Optional

from vinum_spark.sqlprep.tokens import (
    KIND_IDENT,
    KIND_NUMBER,
    KIND_QIDENT,
    KIND_STRING,
    Token,
    split_top_level,
    tokenize,
)

_CLAUSE_AFTER_SELECT = {"FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET"}


def _select_list_tokens(tokens: List[Token]) -> Optional[List[Token]]:
    """Tokens between the first top-level SELECT and the next top-level
    clause keyword. Returns None for non-SELECT input."""
    depth = 0
    start = None
    for i, t in enumerate(tokens):
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        elif depth == 0 and t.is_kw("SELECT"):
            start = i + 1
            break
    if start is None:
        return None
    if start < len(tokens) and tokens[start].is_kw("DISTINCT"):
        start += 1
    end = len(tokens)
    depth = 0
    for i in range(start, len(tokens)):
        t = tokens[i]
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
        elif depth == 0 and t.kind == KIND_IDENT and t.upper() in _CLAUSE_AFTER_SELECT:
            end = i
            break
    return tokens[start:end]


def _item_name(item: List[Token], unnamed_idx: int) -> tuple[str, int]:
    """(name, next_unnamed_idx) for one select-list item."""
    if not item:
        return f"col_{unnamed_idx}", unnamed_idx + 1
    # Explicit alias: ... AS name | trailing bare ident after a primary.
    if len(item) >= 3 and item[-2].is_kw("AS") and item[-1].kind in (
        KIND_IDENT,
        KIND_QIDENT,
    ):
        return _unquote(item[-1]), unnamed_idx
    if (
        len(item) >= 2
        and item[-1].kind in (KIND_IDENT, KIND_QIDENT)
        and not item[-1].is_kw("NULL", "TRUE", "FALSE", "END")
        and (
            item[-2].kind in (KIND_IDENT, KIND_NUMBER, KIND_STRING, KIND_QIDENT)
            or item[-2].text == ")"
        )
        and not item[-2].is_kw("AS")
    ):
        return _unquote(item[-1]), unnamed_idx
    # Bare column reference (possibly table-qualified).
    if len(item) == 1 and item[0].kind in (KIND_IDENT, KIND_QIDENT):
        name = _unquote(item[0])
        return name.split(".")[-1] if item[0].kind == KIND_IDENT else name, unnamed_idx
    # Pure function call spanning the whole item → function name.
    if (
        item[0].kind == KIND_IDENT
        and len(item) >= 3
        and item[1].text == "("
        and item[-1].text == ")"
        and _spans_one_call(item)
    ):
        fname = item[0].text
        if fname.lower() == "count" and len(item) == 4 and item[2].text == "*":
            return "count_star", unnamed_idx
        return fname, unnamed_idx
    return f"col_{unnamed_idx}", unnamed_idx + 1


def _spans_one_call(item: List[Token]) -> bool:
    depth = 0
    for i, t in enumerate(item[1:], start=1):
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
            if depth == 0:
                return i == len(item) - 1
    return False


def _unquote(tok: Token) -> str:
    if tok.kind == KIND_QIDENT:
        q = tok.text[0]
        return tok.text[1:-1].replace(q * 2, q)
    return tok.text


def output_column_names(sql: str) -> Optional[List[str]]:
    """Final output names for a SELECT's columns, or None when the select
    list is ``*`` / unparseable (caller keeps Spark's names)."""
    tokens = tokenize(sql)
    sel = _select_list_tokens(tokens)
    if sel is None:
        return None
    if len(sel) == 1 and sel[0].text == "*":
        return None
    items = split_top_level(sel)
    names: List[str] = []
    seen: dict[str, int] = {}
    unnamed = 0
    for item in items:
        name, unnamed = _item_name(item, unnamed)
        if name in seen:
            seen[name] += 1
            name = f"{name}_{seen[name]}"
        else:
            seen[name] = 0
        names.append(name)
    return names
