"""SQL pre-pass: the thin bespoke layer between the user's (PostgreSQL-ish)
SQL and ``spark.sql``.

The reference parses PostgreSQL SQL with pglast and hand-plans it
(``vinum/parser/parser.py:55``, ``vinum/planner/planner.py:330``). We do
NOT reimplement parsing or planning — Catalyst does both. What remains is:

1. dialect/semantics rewrites (``rewrite.py``) — vinum builtins
   (``to_int``, ``datetime`` …), ``np.*`` function resolution, ``= NULL``,
   pg ``#`` xor, ``||`` null-to-'None' concat;
2. the output column-naming contract (``naming.py``) — replicates
   ``vinum/planner/planner.py:290-328`` (alias → function name →
   ``col_<n>``; duplicate names get ``_<k>`` suffixes).
"""

from vinum_spark.sqlprep.tokens import tokenize, Token
from vinum_spark.sqlprep.rewrite import rewrite_sql
from vinum_spark.sqlprep.naming import output_column_names

__all__ = ["tokenize", "Token", "rewrite_sql", "output_column_names"]
