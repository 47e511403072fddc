"""Join operators — all seven join kinds of the reference.

Reference: ``JoinKind::{Inner, Left, Full, Semi, AntiSemi, Mark, Single}``
(doradb-plan/src/join/mod.rs:88-97) inside ``QualifiedJoin {kind, left,
right, cond, filt}`` (join/mod.rs:16-24) plus N-ary ``Join::Cross``
(join/mod.rs:48-52). The reference never built physical joins (its only
executor is a projection, doradb-server/src/exec/mod.rs:35-37); Spark
supplies broadcast-hash / shuffled-hash / sort-merge / BNL selection via
Catalyst + AQE.

``cond`` vs ``filt``: the reference distinguishes the ON condition from
optimizer-added post-join filters. We mirror that: ``cond`` goes into the
join (equi parts become the shuffle/broadcast keys), ``filt`` is applied
after — Catalyst will push it back down when legal, so the split is
semantic, not physical.

Scale notes: pass ``broadcast=True`` when the right side is a dimension
table — at 100 TB a broadcast-hash join on region/nation/part avoids
shuffling the fact table entirely. Semi/anti joins reduce to Spark's
``left_semi``/``left_anti`` which never materialize right-side columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KIND_MAP = {
    "inner": "inner",
    "left": "left",
    "full": "full",
    "semi": "left_semi",
    "antisemi": "left_anti",
}


def join(
    left: DataFrame,
    right: DataFrame,
    cond: Column | list[Column] | None,
    kind: str = "inner",
    filt: Column | None = None,
    broadcast: bool = False,
) -> DataFrame:
    """QualifiedJoin (join/mod.rs:16-24) for kinds inner/left/full/semi/antisemi."""
    how = _KIND_MAP[kind.lower()]
    r = F.broadcast(right) if broadcast else right
    if isinstance(cond, list):
        cond = _conj(cond)
    out = left.join(r, on=cond, how=how)
    if filt is not None:
        out = out.filter(filt)
    return out


def cross_join(*dfs: DataFrame) -> DataFrame:
    """Join::Cross (join/mod.rs:48-52) — N-ary cross product. The caller
    (or Catalyst, once filters are applied) turns it into real joins."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.crossJoin(d)
    return out


def semi_join(
    left: DataFrame, right: DataFrame, cond: Column | list[Column], broadcast: bool = False
) -> DataFrame:
    """JoinKind::Semi — EXISTS / IN(subquery) after unnesting."""
    return join(left, right, cond, "semi", broadcast=broadcast)


def anti_join(
    left: DataFrame, right: DataFrame, cond: Column | list[Column], broadcast: bool = False
) -> DataFrame:
    """JoinKind::AntiSemi — NOT EXISTS.

    NOTE: this is NOT-EXISTS semantics. SQL ``NOT IN (subquery)`` with a
    nullable subquery column needs :func:`null_aware_anti_join`.
    """
    return join(left, right, cond, "antisemi", broadcast=broadcast)


def null_aware_anti_join(
    left: DataFrame,
    right: DataFrame,
    left_key: Column,
    right_key: Column,
) -> DataFrame:
    """``NOT IN (subquery)`` with correct 3-valued-logic semantics
    (Pred::NotInSubquery, doradb-expr/src/pred.rs:13-20).

    If the subquery yields ANY null, NOT IN is never true; a null probe
    key is never true either. Spark SQL's NOT IN plans a
    null-aware anti join natively; this DataFrame-level version encodes
    the same logic: anti-join plus a guard on right-side null presence.
    The guard aggregate is a cheap global agg broadcast as a literal.
    """
    has_null, nonempty = right.select(
        F.max(right_key.isNull()).alias("has_null"), F.count(F.lit(1)).alias("cnt")
    ).first()
    if has_null:
        return left.limit(0)
    if not nonempty:
        return left
    return left.filter(left_key.isNotNull()).join(
        right.select(right_key.alias("__k")).where(F.col("__k").isNotNull()),
        on=left_key == F.col("__k"),
        how="left_anti",
    )


def mark_join(
    left: DataFrame,
    right: DataFrame,
    cond: Column | list[Column],
    mark: str = "mark",
    broadcast: bool = False,
) -> DataFrame:
    """JoinKind::Mark (join/mod.rs:22,95) — Catalyst's ExistenceJoin:
    keep every left row and add a boolean ``mark`` column telling whether
    a right match exists (the shape needed when EXISTS appears under OR).

    Encoding: left join against the distinct right keys extended with a
    constant flag, then coalesce(flag, false). Only the right columns the
    condition actually references are kept before the ``distinct`` — a
    right side carrying extra non-key columns must not defeat the
    dedup (that would silently duplicate left rows). Consequently the
    output is exactly ``left`` + the mark column, matching the
    reference's mark-join projection (only the mark is visible).
    """
    if isinstance(cond, list):
        cond = _conj(cond)
    keys = _referenced_cols(left, right, cond)
    proj = right.select(*keys).distinct().withColumn("__mark__", F.lit(True))
    r = F.broadcast(proj) if broadcast else proj
    out = left.join(r, on=cond, how="left")
    out = out.withColumn(mark, F.coalesce(proj["__mark__"], F.lit(False)))
    # drop by Column reference so same-named left columns survive
    return out.drop(proj["__mark__"], *[proj[k] for k in keys])


def single_join(
    left: DataFrame,
    right: DataFrame,
    left_key: Column,
    right_key: Column,
    value: Column,
    out_name: str,
) -> DataFrame:
    """JoinKind::Single (join/mod.rs:23,96) — scalar subquery as a join:
    attach at most one right value per left row; NULL when no match;
    runtime error when more than one (ExprKind::Attval semantics,
    doradb-expr/src/expr.rs:42-45 — "if multiple values returned, throws
    runtime error; if none, NULL").

    Implemented as pre-aggregation (count + any value) per key + left
    join, with the uniqueness guard evaluated distributed-side via
    ``raise_error`` — no driver round-trip, scales with the join.
    """
    agg = right.groupBy(right_key.alias("__sk")).agg(
        F.count(F.lit(1)).alias("__cnt"), F.first(value).alias("__val")
    )
    out = left.join(agg, on=left_key == F.col("__sk"), how="left")
    guarded = F.when(
        F.col("__cnt") > 1,
        F.raise_error(F.lit("scalar subquery returned more than one row")),
    ).otherwise(F.col("__val"))
    return out.withColumn(out_name, guarded).drop("__sk", "__cnt", "__val")


def quantified_all(
    left: DataFrame,
    x: Column,
    sub: DataFrame,
    sub_col: str,
    op: str,
    out_name: str,
) -> DataFrame:
    """``x <op> ALL (SELECT sub_col FROM sub)`` as a boolean column —
    the reference's QuantCmp (doradb-sql/src/ast.rs:758-760) lowered
    with full SQL three-valued semantics, not the naive MAX rewrite:

    - empty subquery      → TRUE (the naive ``x > (SELECT MAX ...)``
      yields NULL here — wrong);
    - x NULL (non-empty)  → NULL;
    - counterexample row  → FALSE;
    - no counterexample but subquery has NULLs → NULL.

    One extreme-value aggregate (max for >/>=, min for </<=) plus
    count(*) / count(col) broadcast-attached to every left row; the
    subquery is never joined row-by-row, so cost is one scan of ``sub``
    regardless of |left|.
    """
    extreme, cmp = {
        ">": (F.max, lambda a, m: a > m),
        ">=": (F.max, lambda a, m: a >= m),
        "<": (F.min, lambda a, m: a < m),
        "<=": (F.min, lambda a, m: a <= m),
    }[op]
    agg = sub.agg(
        extreme(sub_col).alias("__m"),
        F.count(F.lit(1)).alias("__cnt"),
        F.count(sub_col).alias("__nn"),
    )
    pred = (
        F.when(F.col("__cnt") == 0, F.lit(True))
        .when(x.isNull(), F.lit(None))
        .when(~cmp(x, F.col("__m")), F.lit(False))
        .when(F.col("__nn") < F.col("__cnt"), F.lit(None))
        .otherwise(F.lit(True))
    )
    out = left.join(F.broadcast(agg))
    return out.withColumn(out_name, pred).drop("__m", "__cnt", "__nn")


def _referenced_cols(left: DataFrame, right: DataFrame, cond: Column) -> list[str]:
    """Names of ``right``'s columns referenced by join condition ``cond``.

    Resolution happens through a throwaway analyzed join (plan-time only,
    nothing executes), so both resolved ``df["k"]`` and unresolved
    ``F.col("k")`` conditions work, and exprId matching stays correct
    even when Catalyst's self-join dedup re-aliases the right side (the
    analyzed Join's right-child output is positionally aligned with
    ``right.columns``). Raises if nothing matches — a mark-join
    condition that touches no right column is a caller bug, and silently
    keeping the whole row would reintroduce the duplication footgun.
    """
    plan = left.join(right, cond, "left")._jdf.queryExecution().analyzed()
    refs = plan.condition().get().references().toSeq()
    ref_ids = {refs.apply(i).exprId().id() for i in range(refs.size())}
    r_out = plan.right().output()
    cols = [
        right.columns[i]
        for i in range(r_out.size())
        if r_out.apply(i).exprId().id() in ref_ids
    ]
    if not cols:
        raise ValueError("join condition references no column of the right side")
    return cols


def _conj(conds: list[Column]) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot key of ``big`` across
    ``salt`` shuffle partitions by joining on (keys + salt bucket), with
    ``small`` replicated ``salt`` times.

    Use when one side has pathological key skew (one key = 10% of rows),
    the other side is too big to broadcast, and AQE's skew-join split
    isn't enough (it splits partitions, not single hot keys' hash
    bucket). Cost: |small| × salt replication — pick the smaller side as
    ``small`` and size ``salt`` ≈ (hot-key rows) / (target partition
    rows). Result is identical to a plain join for every ``how`` that
    keeps all big-side rows matched the same way (inner/left).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    b = big.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = b.join(s, on=keys + ["__salt"], how=how)
    return out.drop("__salt")


def natural_join(left: DataFrame, right: DataFrame, how: str = "inner") -> DataFrame:
    """NATURAL JOIN expanded to a USING equi-join on the common column
    names — the same build-time expansion the reference applies
    (SURVEY §2.7: natural joins expanded during plan build,
    doradb-sql/src/ast.rs:1314-1405). Expanding eagerly (instead of
    trusting a SQL-level NATURAL) keeps the join keys explicit in the
    plan, so broadcast hints and bucketing reasoning still apply."""
    common = [c for c in left.columns if c in set(right.columns)]
    if not common:
        raise ValueError(
            f"natural join has no common columns: {left.columns} vs {right.columns}"
        )
    return left.join(right, on=common, how=how)


def right_join(
    left: DataFrame, right: DataFrame, cond: Column | list[Column]
) -> DataFrame:
    """RIGHT JOIN normalized to a LEFT join with sides swapped — the
    reference's normalization (SURVEY §2.7: right joins normalized to
    left during build). Column order follows the original
    (left-then-right) signature so the caller sees RIGHT JOIN output."""
    if isinstance(cond, list):
        cond = _conj(cond)
    out_cols = [*left.columns, *[c for c in right.columns if c not in left.columns]]
    return right.join(left, on=cond, how="left").select(*out_cols)
