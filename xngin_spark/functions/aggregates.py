"""Aggregate surface + deterministic float aggregation helpers.

Reference aggregates: ``AggKind::{Count, Sum, Avg, Max, Min}`` with
``Setq::{All, Distinct}`` (doradb-expr/src/expr.rs:539-545, 523-526) and
``count(*)`` (expr.rs:140-146). All map 1:1 to pyspark.sql.functions;
this module adds the *deterministic* variants the oracle-parity harness
relies on.

Why: the testdata stores money as double. A parallel double SUM is
order-dependent in the last ulps, so Spark (32-way partial aggs) and the
DuckDB oracle would hash-differ. ``dsum``/``davg`` route through an
exact DECIMAL(25,6) accumulation — per-row IEEE arithmetic is identical
in both engines, the decimal sum is exact and order-independent, and the
final decimal→double cast is deterministic — so results match the oracle
bit-for-bit while the aggregation itself stays a JVM-side partial+final
HashAggregate (no perf loss vs a double sum at scale; decimal(25,6)
fits in a long-backed UnsafeRow slot... it is 128-bit but still
codegen'd).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Accumulation type: wide enough for sf100+ sums of price-scale values
# (25-6=19 integer digits ~ 1e19) while keeping per-row rounding at a
# fixed 6 fractional digits in both engines.
DEC = "decimal(25,6)"


def count_star() -> Column:
    """AggrFuncKind::CountAsterisk (doradb-sql/src/ast.rs:1151-1158)."""
    return F.count(F.lit(1))


def dsum(col: Column, alias: str) -> Column:
    """Deterministic SUM over doubles: exact decimal accumulate → double."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Deterministic AVG: exact decimal sum → double, / count (IEEE
    division of deterministic operands)."""
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias(alias)


# SQL-text twins for oracle queries (DuckDB side must do the identical
# arithmetic). Keep these in sync with dsum/davg.
def dsum_expr(expr: str, alias: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS {alias}"


def davg_expr(expr: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS STRING) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
