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
# MySQL dialect: double-quoted tokens are ALSO string literals and must
# be protected from rewriting, never converted to identifiers.
_STRING_RE_MYSQL = re.compile(r"('(?:[^']|'')*'|\"(?:[^\"]|\"\")*\")")
# ANSI ""-escaped identifier: "a""b" names the identifier a"b.
_ANSI_IDENT_RE = re.compile(r'"((?:[^"]|"")*)"')


def _xor_shim(frag: str) -> str:
    # XOR between boolean terms: lower to != which is 3-valued-logic
    # equivalent for booleans (NULL-propagating, like the reference's
    # LogicKind::Xor).
    return re.sub(r"\bxor\b", "!=", frag, flags=re.IGNORECASE)


def _ansi_ident(m: re.Match) -> str:
    # unescape doubled quotes, then backtick-escape for Spark
    inner = m.group(1).replace('""', '"').replace("`", "``")
    return f"`{inner}`"


def rewrite_sql(sql: str, dialect: str = "ansi") -> str:
    """Rewrite ``sql`` from the named reference dialect into Spark SQL.

    - ``ansi``: double-quoted tokens are identifiers (the reference's
      Ansi dialect, doradb-sql/src/parser/dialect.rs:44-75; e.g.
      tpch11's ``as "value"``) → Spark backticks, with ANSI ``""``
      escapes unescaped; XOR shimmed.
    - ``mysql``: double-quoted tokens are string literals — protected,
      not rewritten; XOR shimmed.
    - ``spark``: pass-through (no token rewriting at all). Use this for
      input already written against Spark's default semantics, where a
      blanket "..."-to-identifier rewrite would corrupt string literals.
    """
    if dialect == "spark":
        return sql
    if dialect == "mysql":
        parts = _STRING_RE_MYSQL.split(sql)
        return "".join(
            p if p[:1] in ("'", '"') else _xor_shim(p) for p in parts
        )
    if dialect != "ansi":
        raise ValueError(f"unknown dialect {dialect!r} (ansi/mysql/spark)")
    parts = _STRING_RE.split(sql)
    return "".join(
        p if p.startswith("'") else _ANSI_IDENT_RE.sub(_ansi_ident, _xor_shim(p))
        for p in parts
    )
