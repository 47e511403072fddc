"""Opt-in DPhyp join reordering for the SQL entry — the product-path
route to :mod:`xngin_spark.plans.reorder`.

Reference parity: the reference runs its join reorder inside EVERY
plan pipeline (doradb-plan/src/join/reorder/mod.rs:24-33 — reorder is
a standard rule between unnesting and scan building), while this
repo's DPhyp was previously reachable only through the plan-builder
API (``reorder_join``). This module closes that gap for ``spark.sql``
text: parse → find the inner-join region(s) in the ANALYZED plan →
run :func:`~xngin_spark.plans.reorder.dphyp_order` over the extracted
join graph → re-emit the SQL with the chosen order pinned in the FROM
clause (SQL's syntactic join order IS the executed order when CBO
join reorder is off — Spark's default — so the emitted nesting is the
plan's join tree, modulo AQE's build-side/broadcast choices, which
are orthogonal to ORDER).

Why text re-emission rather than plan surgery: the reflection
renderer (:mod:`xngin_spark.plans.reflect`) already proves every
corpus shape renders to result-equivalent SQL; reordering only the
join fragments of that same rendering inherits the whole proof
surface. The rewriter is a _Renderer subclass overriding exactly one
method (``_join_fragment``), so windows, grouping sets, setops,
derived tables and subqueries all render through the battle-tested
base arms.

Edges come from two places, matching how people actually write SQL:
ON conditions inside the join tree (ANSI syntax), and equi-conjuncts
of the ENCLOSING WHERE (TPC-H comma syntax — the reference's own
.sql files). WHERE conjuncts used as edges are NOT removed from the
WHERE: for inner joins the duplicate predicate is a no-op semantically
and Catalyst collapses it, which keeps the rewrite purely additive —
the fallback path (any unsupported shape) is the ORIGINAL text,
always.

Scale note: the rewrite is driver-side plan analysis only (leaf
cardinalities come from Catalyst's optimized-plan statistics — no
jobs run). At 100 TB the win is the ORDER itself: a mis-ordered
6-table join materializes intermediate results orders of magnitude
larger than the optimum; DPhyp's C_out optimum bounds the shuffle
volume Catalyst's syntactic order would otherwise commit to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from xngin_spark.plans.reflect import (
    Unreflectable,
    _name,
    _Renderer,
    _seq,
)
from xngin_spark.plans.reorder import (
    CrossJoinNotSupported,
    DPhypBudgetExceeded,
    Edge,
    catalyst_rows,
    dphyp_order,
)


#: leaf-cardinality probe cache keyed by (session id, probe SQL): the
#: probe is pure driver-side analysis, but it still reads parquet
#: footers — a suite re-running the same rewrite shouldn't repeat it
_STATS_CACHE: dict[tuple[int, str], float] = {}


def _conjuncts(expr) -> list:
    if _name(expr) == "And":
        return _conjuncts(expr.left()) + _conjuncts(expr.right())
    return [expr]


def _flatten_region(join) -> tuple[list, list]:
    """Flatten a tree of condition-carrying INNER/CROSS joins into
    (leaves, ON-conjuncts). Any non-inner join ends the region and
    becomes a leaf (it is order-constraining; the base renderer and
    a nested region of ITS sides handle it)."""
    leaves, conds = [], []

    def rec(n):
        if _name(n) == "Join" and n.joinType().sql().upper() in (
            "INNER",
            "CROSS",
        ):
            c = n.condition()
            if c.isDefined():
                conds.extend(_conjuncts(c.get()))
            ch = n.children()
            rec(ch.apply(0))
            rec(ch.apply(1))
        else:
            leaves.append(n)

    rec(join)
    return leaves, conds


class _DPhypRenderer(_Renderer):
    """Reflection renderer whose inner-join regions (≥3 leaves) come
    out in DPhyp order. Everything else is the base renderer."""

    def __init__(self, jvm, spark: SparkSession) -> None:
        super().__init__(jvm)
        self._spark = spark
        #: one entry per rewritten region: the leaf-name merge order
        #: [(left_names, right_names), ...] — tests assert the emitted
        #: SQL (and therefore the executed plan) follows it
        self.traces: list[list[tuple[frozenset, frozenset]]] = []
        # stack of WHERE-conjunct lists from enclosing Filters — the
        # comma-join syntax keeps its join predicates there
        self._pending: list[list] = []

    def select(self, node) -> str:
        kind = _name(node)
        ch = node.children()
        f = None
        if ch.size() == 1 and kind in (
            "Project",
            "Aggregate",
            "Filter",
            "Sort",
        ):
            f = node if kind == "Filter" else None
            if f is None and _name(ch.apply(0)) == "Filter":
                f = ch.apply(0)
        # EVERY select() entry opens a fresh conjunct scope: the arm's
        # own same-level filter, or an empty sentinel. Attribute exprIds
        # flow unchanged through Window/Limit/Deduplicate/derived-table
        # boundaries, so an outer WHERE equality would otherwise be
        # classified as an edge of a join region BELOW one of those
        # operators and get injected into its JOIN ON — filtering rows
        # before the window/limit computes. The base renderer re-enters
        # select() exactly at those scope boundaries (derived tables,
        # setop children, the inner query of a LIMIT arm), so masking
        # per entry leaves only the filter directly above the join
        # region (modulo the base arms' inline Filter consumption)
        # visible to _dphyp_fragment.
        self._pending.append(_conjuncts(f.condition()) if f is not None else [])
        try:
            return super().select(node)
        finally:
            self._pending.pop()

    def _join_fragment(self, node, may_hoist=True, extra_on=None):
        try:
            frag = self._dphyp_fragment(node, extra_on)
        except (
            Unreflectable,
            CrossJoinNotSupported,
            DPhypBudgetExceeded,
            ValueError,
        ):
            frag = None
        if frag is not None:
            return frag, False
        return super()._join_fragment(node, may_hoist, extra_on)

    # ---- the region rewrite ---------------------------------------------

    def _dphyp_fragment(self, node, extra_on) -> str | None:
        leaves, jconds = _flatten_region(node)
        if len(leaves) < 3:
            return None  # nothing to reorder

        # attribute → leaf index by exprId (bare-name collisions across
        # leaves are fine: ON conditions re-render via Expression.sql()
        # which qualifies by the preserved leaf aliases — the q8
        # self-joined-nation shape)
        amap: dict[int, int] = {}
        for i, lf in enumerate(leaves):
            for a in _seq(lf.output()):
                amap[a.exprId().id()] = i

        def attr_leaves(e) -> set[int] | None:
            """Leaf set referenced by expression e, None when any
            attribute is foreign (e.g. a correlated outer ref)."""
            out: set[int] = set()
            if _name(e) == "AttributeReference":
                i = amap.get(e.exprId().id())
                if i is None:
                    return None
                return {i}
            for c in _seq(e.children()):
                s = attr_leaves(c)
                if s is None:
                    return None
                out |= s
            return out

        # classify conjuncts: equi attr=attr across two leaves → edge;
        # join-tree residue must be preserved on the final ON; WHERE
        # residue stays in the WHERE the enclosing arm renders anyway
        pend = self._pending[-1] if self._pending else []
        edges: list[Edge] = []
        edge_texts: list[str] = []  # parallel to `edges`
        residual_on: list[str] = []
        leaf_filters: dict[int, list[str]] = {}
        vname = [None] * len(leaves)
        for i, lf in enumerate(leaves):
            alias = lf.alias() if _name(lf) == "SubqueryAlias" else None
            vname[i] = alias or f"__dp{i}"
        if len(set(vname)) != len(vname):
            return None

        def classify(c, from_where: bool) -> None:
            if _name(c) == "EqualTo":
                l, r = c.left(), c.right()
                if (
                    _name(l) == "AttributeReference"
                    and _name(r) == "AttributeReference"
                ):
                    li = amap.get(l.exprId().id())
                    ri = amap.get(r.exprId().id())
                    if li is not None and ri is not None and li != ri:
                        edges.append(
                            Edge(
                                vname[li],
                                vname[ri],
                                ((l.name(), r.name()),),
                            )
                        )
                        edge_texts.append(c.sql())
                        return
            refs = attr_leaves(c)
            if from_where:
                if refs is not None and len(refs) == 1:
                    # single-leaf WHERE conjunct: not an edge, but
                    # sharpens that leaf's cardinality estimate
                    leaf_filters.setdefault(next(iter(refs)), []).append(
                        c.sql()
                    )
                return  # stays in the enclosing WHERE either way
            residual_on.append(c.sql())

        for c in jconds:
            classify(c, from_where=False)
        for c in pend:
            classify(c, from_where=True)
        if not edges:
            return None

        # leaf fragments + Catalyst-stats cardinalities (driver-side
        # only — the stats probe is never executed)
        frag: dict[frozenset, str] = {}
        rows: dict[str, float] = {}
        for i, lf in enumerate(leaves):
            sql, pruned = self._from_item(lf, may_hoist=False)
            if pruned:
                return None
            frag[frozenset([vname[i]])] = sql
            probe = f"SELECT * FROM {sql}"
            flt = leaf_filters.get(i)
            if flt:
                probe += " WHERE " + " AND ".join(f"({c})" for c in flt)
            key = (id(self._spark), probe)
            got = _STATS_CACHE.get(key)
            if got is None:
                try:
                    got = catalyst_rows(self._spark.sql(probe))
                except Exception:
                    got = catalyst_rows(
                        self._spark.sql(f"SELECT * FROM {sql}")
                    )
                _STATS_CACHE[key] = got
            rows[vname[i]] = got

        trace = dphyp_order(rows, edges)

        remaining = set(range(len(edges)))
        parts: list[str] = []
        comp_sql = dict(frag)
        for L, R, _est in trace:
            crossing = [
                k
                for k in remaining
                if (edges[k].a in L and edges[k].b in R)
                or (edges[k].a in R and edges[k].b in L)
            ]
            remaining -= set(crossing)
            on = [f"({edge_texts[k]})" for k in sorted(crossing)]
            merged = (
                f"{comp_sql.pop(L)} INNER JOIN {comp_sql.pop(R)}"
                f" ON {' AND '.join(on)}"
            )
            comp_sql[L | R] = f"({merged})"
            parts.append((L, R))
        [top] = comp_sql.values()
        # intermediate merges are parenthesized; strip the outer pair
        # (callers wrap the fragment themselves, matching the base)
        top = top[1:-1]
        tail = [f"({c})" for c in residual_on] + [
            f"({c})" for c in (extra_on or [])
        ]
        if tail:
            top = f"{top} AND {' AND '.join(tail)}"
        self.traces.append(parts)
        return top


def dphyp_rewrite(spark: SparkSession, sql: str) -> tuple[str, list]:
    """Rewrite ``sql`` with DPhyp-ordered join regions. Returns
    ``(text, traces)`` — ``traces`` is one merge-order list per
    rewritten region, empty when the query had no reorderable region
    or any shape fell outside the renderer's surface (the returned
    text is then the ORIGINAL, verbatim: the fallback is always the
    untouched query, never a partial rewrite)."""
    import re

    from pyspark.errors import AnalysisException

    df = spark.sql(sql)
    r = _DPhypRenderer(jvm=spark._jvm, spark=spark)
    try:
        text = r.select(df._jdf.queryExecution().analyzed())
    except Exception:  # Unreflectable or any renderer gap → fall back
        return sql, []
    if not r.traces:
        return sql, []
    text = re.sub(r"extract\('(\w+)' FROM ", r"extract(\1 FROM ", text)
    try:
        spark.sql(text).schema  # force analysis of the rewrite
    except AnalysisException:
        return sql, []
    return text, r.traces


def dphyp_sql(spark: SparkSession, sql: str) -> DataFrame:
    """``spark.sql`` with the DPhyp join order pinned — the opt-in
    product entry (reorder/mod.rs:24-33 analog). Result-identical to
    ``spark.sql(sql)`` by construction (inner joins commute; only the
    FROM nesting changes); falls back to the original text whenever
    the shape is unsupported."""
    text, _ = dphyp_rewrite(spark, sql)
    return spark.sql(text)
