"""Predicate surface — the reference's ``PredFuncKind`` inventory.

Reference: doradb-expr/src/pred.rs:31-58 (Equal..NotBetween) and the
composite ``Pred::{Conj, Disj, Xor, Not, InSubquery, NotInSubquery,
Exists, NotExists}`` (pred.rs:5-20). Most items are native Column
operators (``== > >= < <= !=``, ``isNull``, ``like``, ``rlike``,
``isin``, ``between``); here live only the ones Spark spells
differently, with exact 3-valued-logic semantics. Subquery predicates
(InSubquery/Exists) are in plans/joins.py as semi/anti/mark joins —
the unnesting the reference planned but never implemented
(pred_pushdown_old.rs:44-47).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_eq(a: Column, b: Column) -> Column:
    """PredFuncKind::SafeEqual (pred.rs) — MySQL ``<=>``: null-safe
    equality, never NULL."""
    return a.eqNullSafe(b)


def is_true(a: Column) -> Column:
    """IS TRUE: NULL → false (not NULL). 3-valued per the reference's
    logic kernel (doradb-compute/src/logic.rs:11-42)."""
    return a.eqNullSafe(F.lit(True))


def is_not_true(a: Column) -> Column:
    return ~a.eqNullSafe(F.lit(True))


def is_false(a: Column) -> Column:
    return a.eqNullSafe(F.lit(False))


def is_not_false(a: Column) -> Column:
    return ~a.eqNullSafe(F.lit(False))


def logical_xor(a: Column, b: Column) -> Column:
    """Pred::Xor / LogicKind::Xor (logic.rs:11-42): NULL-propagating
    boolean exclusive-or = 3-valued ``!=`` on booleans."""
    return a.cast("boolean") != b.cast("boolean")
