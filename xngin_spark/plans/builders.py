"""Relational operator builders.

Each function maps one logical operator of the reference's algebra
(``OpKind``, doradb-plan/src/lgc/op.rs:162-216) to its Spark DataFrame
form. These are deliberately thin: the point is to *declare* the plan and
let Catalyst do what the reference's rule optimizer
(doradb-plan/src/rule/mod.rs:55-85) did by hand — predicate pushdown,
column pruning, empty propagation are all built-in.

Scale note: none of these force a shuffle beyond what the operator
semantically requires (aggr/sort/distinct shuffle on their keys; proj and
filt are narrow).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def scan(
    spark: SparkSession,
    path_or_table: str,
    cols: Iterable[str] | None = None,
    pred: Column | None = None,
) -> DataFrame:
    """TableScan {cols, filt} (doradb-plan/src/lgc/op.rs:543-553).

    Projection and predicate are attached directly to the scan so Catalyst
    pushes them into the parquet reader (visible as ``PushedFilters`` /
    ``ReadSchema`` in the formatted plan — the Spark analog of the
    reference's SMA zone-map skipping, doradb-storage/src/col/sma.rs).
    """
    df = (
        spark.read.parquet(path_or_table)
        if "/" in path_or_table or path_or_table.endswith(".parquet")
        else spark.table(path_or_table)
    )
    if pred is not None:
        df = df.filter(pred)
    if cols is not None:
        df = df.select(*cols)
    return df


def proj(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Proj {cols} (lgc/op.rs:169) → ``select``."""
    return df.select(*cols)


def filt(df: DataFrame, *preds: Column) -> DataFrame:
    """Filt {pred: Vec<Expr>} (lgc/op.rs:174) — predicate list is an
    implicit conjunction, same as the reference."""
    out = df
    for p in preds:
        out = out.filter(p)
    return out


def aggr(
    df: DataFrame,
    groups: Iterable[Column | str],
    aggs: Iterable[Column],
    having: Column | None = None,
) -> DataFrame:
    """Aggr {groups, proj, filt} (lgc/op.rs:502-508): group-by + aggregate
    projection + HAVING post-filter in one node, like the reference.

    Spark plans this as partial (map-side) + final HashAggregate — a
    shuffle on the group keys only, which is the minimum possible.
    Empty ``groups`` = global aggregate (single row).
    """
    groups = list(groups)
    gdf = df.groupBy(*groups) if groups else df.groupBy()
    out = gdf.agg(*aggs)
    if having is not None:
        out = out.filter(having)
    return out


def sort(
    df: DataFrame,
    items: Iterable[Column],
    fused_limit: int | None = None,
) -> DataFrame:
    """Sort {items, limit} (lgc/op.rs:186-190, 538-541).

    With ``fused_limit`` Spark plans ``TakeOrderedAndProject`` — a true
    distributed top-k (per-partition heap + driver merge), never a global
    sort. This is exactly the fused top-k the reference's Sort carries.
    """
    out = df.orderBy(*items)
    if fused_limit is not None:
        out = out.limit(fused_limit)
    return out


def limit(df: DataFrame, end: int, start: int = 0) -> DataFrame:
    """Limit {start, end} (lgc/op.rs:192-196) — OFFSET + FETCH."""
    if start:
        return df.offset(start).limit(end - start)
    return df.limit(end)


def setop(kind: str, q: str, left: DataFrame, right: DataFrame) -> DataFrame:
    """Setop {kind, q} (doradb-plan/src/lgc/setop.rs:8-22).

    kind ∈ {union, except, intersect}; q ∈ {all, distinct} — the same
    (SetopKind, Setq) product as the reference. Columns match by
    position, as in SQL set operations.
    """
    kind, q = kind.lower(), q.lower()
    if kind == "union":
        out = left.union(right)
        return out.distinct() if q == "distinct" else out
    if kind == "except":
        return left.exceptAll(right) if q == "all" else left.subtract(right)
    if kind == "intersect":
        return left.intersectAll(right) if q == "all" else left.intersect(right)
    raise ValueError(f"unknown setop kind {kind!r}")


def row(spark: SparkSession, *cols: Column) -> DataFrame:
    """Row (lgc/op.rs:202) — table-less single row, ``SELECT 1``."""
    return spark.range(1).select(*cols)


def attach_scalar(df: DataFrame, name: str, scalar_df: DataFrame) -> DataFrame:
    """Attach (lgc/op.rs:197-200): non-correlated scalar subquery computed
    standalone and attached to every row.

    The reference hoists these into ``plan.attaches`` for separate
    execution (lgc/builder.rs:88-92). Spark equivalent: evaluate the
    1×1 DataFrame once on the driver and inline as a literal — Catalyst
    then constant-folds it into pushed-down predicates, which a
    join-based encoding would not allow. ``scalar_df`` must be a global
    aggregate (exactly one row, one column).
    """
    value = scalar_df.collect()[0][0]
    return df.withColumn(name, F.lit(value))
