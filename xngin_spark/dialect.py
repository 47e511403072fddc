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


def _top_level_tokens(sql: str) -> list[tuple[int, str]]:
    """(position, lowercased word) for every word token at paren depth 0,
    outside '...'/"..."/`...` quoting (with doubled-quote escapes)."""
    out: list[tuple[int, str]] = []
    depth = i = 0
    n = len(sql)
    while i < n:
        c = sql[i]
        if c in ("'", '"'):
            j = i + 1
            while j < n:
                if sql[j] == c:
                    if j + 1 < n and sql[j + 1] == c:
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if c == "`":
            j = sql.find("`", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if c == "(":
            depth += 1
            i += 1
            continue
        if c == ")":
            depth -= 1
            i += 1
            continue
        if depth == 0 and (c.isalpha() or c == "_"):
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            out.append((i, sql[i:j].lower()))
            i = j
            continue
        i += 1
    return out


# clause keywords that may follow the QUALIFY predicate at top level
_QUALIFY_TAIL = {"order", "limit", "offset", "union", "except", "intersect"}


def rewrite_qualify(sql: str) -> str:
    """Lower a top-level ``QUALIFY <pred>`` clause (DuckDB / Snowflake /
    BigQuery post-window filter; Spark has none) into a subquery:

        SELECT * EXCEPT(__q) FROM (
          SELECT <list>, (<pred>) AS __q FROM ... WHERE/GROUP/HAVING
        ) WHERE __q  [ORDER BY/LIMIT tail]

    The window expressions in ``pred`` evaluate inside the subquery
    where the FROM scope is intact, so predicates may partition/order
    by columns absent from the select list. Conservative by design:
    one top-level QUALIFY, no DISTINCT, no set operation BEFORE the
    QUALIFY (a trailing UNION after the predicate lands in the tail
    and composes correctly) — anything else raises rather than risking
    a silent mis-rewrite. (QUALIFY nested inside subqueries is not
    rewritten and will fail Spark's parser loudly.)
    """
    toks = _top_level_tokens(sql)
    quals = [p for p, w in toks if w == "qualify"]
    if not quals:
        return sql
    if len(quals) > 1:
        raise ValueError("QUALIFY rewrite supports one top-level clause")
    qpos = quals[0]
    sel = next((p for p, w in toks if w == "select"), None)
    frm = next((p for p, w in toks if w == "from" and p > (sel or 0)), None)
    if sel is None or frm is None or not (sel < frm < qpos):
        raise ValueError("QUALIFY rewrite: unsupported statement shape")
    if any(w == "distinct" and sel < p < frm for p, w in toks):
        raise ValueError("QUALIFY rewrite: DISTINCT not supported")
    if any(w in ("union", "except", "intersect") and p < qpos for p, w in toks):
        raise ValueError("QUALIFY rewrite: set operations not supported")
    tail_pos = next(
        (p for p, w in toks if p > qpos and w in _QUALIFY_TAIL), len(sql)
    )
    pred = sql[qpos + len("qualify"):tail_pos].strip()
    if not pred:
        raise ValueError("QUALIFY rewrite: empty predicate")
    head = sql[:sel]
    inner = f"{sql[sel:frm]}, ({pred}) AS __q {sql[frm:qpos]}"
    return (
        f"{head}SELECT * EXCEPT(__q) FROM ( {inner} ) WHERE __q "
        f"{sql[tail_pos:]}"
    )


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
    sql = rewrite_qualify(sql)
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
