"""Scalar functions — the reference's ``FuncKind`` inventory.

Reference: doradb-expr/src/func.rs:2-27 — Neg, BitInv, Add, Sub, Mul,
Div, IntDiv, BitAnd, BitOr, BitXor, BitShl, BitShr, Extract, Substring —
plus expression forms Case and Cast (doradb-expr/src/expr.rs:28-37).

Add/Sub/Mul/Div/Neg and Cast are native Column operators (``+ - * /``,
``-col``, ``col.cast``); only the items Spark spells differently get a
wrapper here. Everything stays JVM-side / whole-stage-codegen — no
Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EXTRACT_UNITS = {
    # TimeUnit (doradb-datatype/src/lib.rs:435-445): µs…year
    "microsecond": "MICROSECOND",
    "second": "SECOND",
    "minute": "MINUTE",
    "hour": "HOUR",
    "day": "DAY",
    "week": "WEEK",
    "month": "MONTH",
    "quarter": "QUARTER",
    "year": "YEAR",
}


def int_div(a: Column, b: Column) -> Column:
    """FuncKind::IntDiv (func.rs:16) — MySQL ``DIV``: integer division
    truncating toward zero (Spark's ``div`` operator requires integral
    inputs; this works for all numeric types)."""
    q = a / b
    return F.when(q >= 0, F.floor(q)).otherwise(-F.floor(-q)).cast("long")


def extract(unit: str, col: Column) -> Column:
    """FuncKind::Extract (func.rs:24) over TimeUnit µs…year
    (doradb-datatype/src/lib.rs:435-445). ``week`` follows ISO week
    number like MySQL's default-mode approximation."""
    u = unit.lower()
    if u not in _EXTRACT_UNITS:
        raise ValueError(f"unsupported extract unit {unit!r}")
    if u == "week":
        return F.weekofyear(col).cast("long")
    return F.extract(F.lit(_EXTRACT_UNITS[u]), col).cast("long")


def substring_sql(src: Column, start: int | Column, length: int | Column | None = None) -> Column:
    """FuncKind::Substring (func.rs:25-26; ast.rs:1044-1049) —
    SUBSTRING(src FROM start [FOR len]), 1-based like MySQL/ANSI."""
    if length is None:
        length = 2**31 - 1
    return F.substring(src, start, length)


def case_when(branches: list[tuple[Column, Column]], fallback: Column | None = None) -> Column:
    """Case {op, acts, fallback} (doradb-expr/src/expr.rs:28-32)."""
    out = F.when(*branches[0])
    for cond, val in branches[1:]:
        out = out.when(cond, val)
    return out.otherwise(fallback) if fallback is not None else out


# Bit ops (func.rs:10,17-21) — native Column operators, named here for
# inventory completeness.
def bit_and(a: Column, b: Column) -> Column:
    return a.bitwiseAND(b)


def bit_or(a: Column, b: Column) -> Column:
    return a.bitwiseOR(b)


def bit_xor(a: Column, b: Column) -> Column:
    return a.bitwiseXOR(b)


def bit_shl(a: Column, n: int) -> Column:
    return F.shiftleft(a, n)


def bit_shr(a: Column, n: int) -> Column:
    return F.shiftright(a, n)


def bit_inv(a: Column) -> Column:
    """FuncKind::BitInv (func.rs:10) — ``~a``."""
    return F.bitwise_not(a)
