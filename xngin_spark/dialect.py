"""SQL dialect shims: reference parser surface → Spark SQL.

The reference parses MySQL and ANSI dialects (doradb-sql/src/parser/
dialect.rs:14-20). Spark SQL covers nearly all of it natively (backtick
identifiers included). The shims below cover the few MySQL-isms Spark
lacks, applied as conservative token-level rewrites outside string
literals:

- ``a XOR b``    → boolean inequality (doradb-expr logic kernel XOR,
                   doradb-compute/src/logic.rs:11-42).
- ``a DIV b``    → integer division; Spark has the same ``div`` operator
                   so this is a pass-through, kept for documentation.

Everything else in the reference's predicate surface — <=> (SafeEqual,
doradb-expr/src/pred.rs:31-58), IS [NOT] TRUE/FALSE, LIKE/REGEXP,
IN/BETWEEN, EXISTS/quantified subqueries — parses natively in Spark SQL.
"""

from __future__ import annotations

import re

# Split on single-quoted strings so rewrites never touch literals.
_STRING_RE = re.compile(r"('(?:[^']|'')*')")


def _rewrite_fragment(frag: str) -> str:
    # XOR between boolean terms: lower to != which is 3-valued-logic
    # equivalent for booleans (NULL-propagating, like the reference's
    # LogicKind::Xor).
    frag = re.sub(r"\bxor\b", "!=", frag, flags=re.IGNORECASE)
    # ANSI double-quoted identifiers (the reference's Ansi dialect quotes
    # idents with ", doradb-sql/src/parser/dialect.rs:44-75; e.g.
    # tpch11's `as "value"`) → Spark backticks. Spark reads "..." as a
    # string literal by default, so this runs outside single-quoted
    # strings only.
    frag = re.sub(r'"([^"]*)"', r"`\1`", frag)
    return frag


def rewrite_sql(sql: str) -> str:
    parts = _STRING_RE.split(sql)
    return "".join(p if p.startswith("'") else _rewrite_fragment(p) for p in parts)
