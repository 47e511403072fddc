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
    measure_edge_ndv,
    tree_cost,
)


#: leaf-cardinality probe cache keyed by (session id, probe SQL): the
#: probe is pure driver-side analysis, but it still reads parquet
#: footers — a suite re-running the same rewrite shouldn't repeat it
_STATS_CACHE: dict[tuple[int, str], float] = {}

#: join-key NDV cache per session — measure_edge_ndv keys entries by
#: (leaf plan fingerprint, column), so each (filtered leaf, key) pair
#: pays its HLL aggregate once per session. This is the ANALYZE
#: discipline executed lazily: at 100 TB you'd persist these stats;
#: here they amortize over every later query touching the same leaf
_NDV_CACHE: dict[int, dict[tuple[str, str], float]] = {}

#: analyzed leaf-probe DataFrames keyed by (session id, probe SQL) —
#: measure_edge_ndv fingerprints each vertex's plan, which needs an
#: analyzed DataFrame; re-analyzing the same probe text every query
#: re-reads parquet footers (~100ms/leaf measured), so the DataFrame
#: itself is memoized alongside the stats. LRU-bounded: each entry
#: pins a JVM analyzed plan (the reflect-registry leak class), so a
#: long-lived server session must not grow it with query diversity
_VERTEX_CACHE: dict[tuple[int, str], DataFrame] = {}
_VERTEX_CACHE_MAX = 512


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

    def __init__(
        self,
        jvm,
        spark: SparkSession,
        mode: str = "always",
        margin: float = 10.0,
        min_benefit: float = 20_000.0,
        optimized=None,
    ) -> None:
        super().__init__(jvm)
        self._spark = spark
        #: "always" rewrites every reorderable region; "auto" rewrites
        #: only when the baseline order's estimated C_out exceeds
        #: ``margin`` × the DPhyp optimum AND the absolute saving
        #: exceeds ``min_benefit`` intermediate rows — the cost gate
        #: that makes default-on safe. The ratio finds genuinely
        #: mis-ordered texts (stock TPC-H gates ≤4.5× at sf0.01+, the
        #: adversarial q5 at 200-1100×); the absolute floor keeps
        #: tiny-input queries (where estimate ratios are noisy and the
        #: saving is thousands of rows, not billions) on their original
        #: plans — plan churn has a fixed cost, the benefit scales with
        #: rows saved, and at 100 TB any real mis-order clears 20k rows
        #: by six orders of magnitude
        self._mode = mode
        self._margin = float(margin)
        self._min_benefit = float(min_benefit)
        #: the ORIGINAL query's optimized logical plan — the baseline
        #: the gate costs, because it is what Spark actually executes
        #: (ReorderJoin already repairs condition-less comma-join
        #: nestings; costing the raw syntactic tree would overstate the
        #: baseline and over-trigger rewrites)
        self._optimized = optimized
        #: one entry per rewritten region: the leaf-name merge order
        #: [(left_names, right_names), ...] — tests assert the emitted
        #: SQL (and therefore the executed plan) follows it
        self.traces: list[list[tuple[frozenset, frozenset]]] = []
        #: one (baseline_cost, dphyp_cost, fired) per gate decision in
        #: auto mode — telemetry for tests and calibration
        self.gate_log: list[tuple[float, float, bool]] = []
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

    # ---- the auto-mode cost gate ----------------------------------------

    def _baseline_merge_seq(
        self, node, amap: dict[int, int], vname: list
    ) -> list[tuple[frozenset, frozenset]]:
        """Merge sequence of the order Spark would otherwise execute
        for this region, in vname terms. Preferred source is the
        ORIGINAL query's optimized plan (post-ReorderJoin — what plain
        ``spark.sql`` actually runs); when the optimized plan has no
        join region over exactly these leaves (boundary collapsed or
        rewritten away), fall back to the analyzed region's own
        syntactic nesting, which can only overstate the baseline cost
        (the gate then errs toward rewriting — still result-identical,
        only plan churn)."""
        seq = self._region_merge_seq(self._optimized, amap, vname)
        if seq is not None:
            return seq
        seq = self._region_merge_seq(node, amap, vname)
        return seq if seq is not None else []

    def _region_merge_seq(
        self, root, amap: dict[int, int], vname: list
    ) -> list[tuple[frozenset, frozenset]] | None:
        """Search ``root`` for an inner/cross-join region covering
        exactly the leaf set named by ``vname`` (leaves matched by any
        surviving output exprId — stable analyzed→optimized) and
        return its merge pairs; None when no such region exists."""
        if root is None:
            return None
        target = frozenset(vname)

        def leaf_names(n) -> frozenset | None:
            ids = set()
            for a in _seq(n.output()):
                i = amap.get(a.exprId().id())
                if i is not None:
                    ids.add(i)
            if len(ids) != 1:
                return None  # spans several region leaves or none
            return frozenset([vname[next(iter(ids))]])

        def flatten(n, pairs) -> frozenset | None:
            if _name(n) == "Join" and n.joinType().sql().upper() in (
                "INNER",
                "CROSS",
            ):
                ch = n.children()
                l = flatten(ch.apply(0), pairs)
                r = flatten(ch.apply(1), pairs)
                if l is None or r is None or l & r:
                    return None
                pairs.append((l, r))
                return l | r
            return leaf_names(n)

        # walk top-down; the first join whose flattened leaf set is
        # exactly the target is the region
        stack = [root]
        while stack:
            n = stack.pop()
            if _name(n) == "Join" and n.joinType().sql().upper() in (
                "INNER",
                "CROSS",
            ):
                pairs: list = []
                got = flatten(n, pairs)
                if got == target:
                    return pairs
            ch = n.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        return None

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
        probes: dict[str, str] = {}
        for i, lf in enumerate(leaves):
            sql, pruned = self._from_item(lf, may_hoist=False)
            if pruned:
                return None
            frag[frozenset([vname[i]])] = sql
            probe = f"SELECT * FROM {sql}"
            flt = leaf_filters.get(i)
            if flt:
                probe += " WHERE " + " AND ".join(f"({c})" for c in flt)
            probes[vname[i]] = probe
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

        # measured join-key NDVs (one cached HLL aggregate per filtered
        # leaf — the lazy-ANALYZE discipline). Without them the
        # System-R fallback treats a fact table's FK domain as its row
        # count, which both mis-ranks orders (the q5 graph plans 9×
        # slower, reorder.measure_edge_ndv docstring) and collapses the
        # auto gate's discrimination: the adversarial fact-first q5
        # estimates only 1.3× worse than optimal under the fallback,
        # but 50×+ under measured NDVs — the signal the gate needs.
        ndv = None
        try:
            sid = id(self._spark)
            vertices = {}
            for v, p in probes.items():
                key = (sid, p)
                df = _VERTEX_CACHE.pop(key, None)
                if df is None:
                    df = self._spark.sql(p)
                while len(_VERTEX_CACHE) >= _VERTEX_CACHE_MAX:
                    _VERTEX_CACHE.pop(next(iter(_VERTEX_CACHE)))
                _VERTEX_CACHE[key] = df  # re-insert = most recent
                vertices[v] = df
            ndv = measure_edge_ndv(
                vertices,
                edges,
                cache=_NDV_CACHE.setdefault(sid, {}),
            )
            for v in probes:
                got = ndv.get((v, "__rows__"))
                if got:  # exact counts ride along free — prefer them
                    rows[v] = got
        except Exception:
            ndv = None  # estimator degrades to the base-rows guess

        trace = dphyp_order(rows, edges, ndv)

        if self._mode == "auto":
            base_seq = self._baseline_merge_seq(node, amap, vname)
            syn_cost = tree_cost(rows, edges, base_seq, ndv)
            dp_cost = tree_cost(
                rows, edges, [(L, R) for L, R, _ in trace], ndv
            )
            fired = (
                syn_cost > self._margin * dp_cost
                and syn_cost - dp_cost > self._min_benefit
            )
            self.gate_log.append((syn_cost, dp_cost, fired))
            if not fired:
                return None  # baseline order is fine — keep the text

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


import re as _re

#: leading comments/whitespace, then the first keyword — only genuine
#: queries enter the rewriter. Commands (INSERT/CREATE/SET/...) execute
#: EAGERLY at ``spark.sql`` creation, so routing one through the
#: rewriter's analysis pass and then re-running the returned text would
#: double-execute it. The guard is a short-circuit, not a fallback.
_QUERY_HEAD = _re.compile(
    r"^(?:\s|--[^\n]*\n|/\*.*?\*/)*(SELECT|WITH|VALUES|TABLE|\()",
    _re.IGNORECASE | _re.DOTALL,
)


def is_query_text(sql: str) -> bool:
    """True when ``sql`` is a read-only query (SELECT/WITH/VALUES/
    TABLE/parenthesized), i.e. safe to analyze-then-re-run."""
    return _QUERY_HEAD.match(sql) is not None


def dphyp_rewrite(
    spark: SparkSession,
    sql: str,
    mode: str = "always",
    margin: float = 10.0,
    min_benefit: float = 20_000.0,
) -> tuple[str, list]:
    """Rewrite ``sql`` with DPhyp-ordered join regions. Returns
    ``(text, traces)`` — ``traces`` is one merge-order list per
    rewritten region, empty when the query had no reorderable region
    or any shape fell outside the renderer's surface (the returned
    text is then the ORIGINAL, verbatim: the fallback is always the
    untouched query, never a partial rewrite).

    ``mode="auto"`` adds the cost gate: a region is rewritten only
    when the baseline order (the ORIGINAL text's optimized plan —
    what plain ``spark.sql`` executes) costs more than ``margin`` ×
    the DPhyp optimum under the shared C_out estimator AND the saving
    exceeds ``min_benefit`` intermediate rows. Well-written texts keep
    their plans; only genuinely mis-ordered ones change — the property
    that makes this safe as the default."""
    import re

    from pyspark.errors import AnalysisException

    if not is_query_text(sql):
        return sql, []
    df = spark.sql(sql)
    optimized = None
    if mode == "auto":
        try:
            optimized = df._jdf.queryExecution().optimizedPlan()
        except Exception:
            optimized = None
    r = _DPhypRenderer(
        jvm=spark._jvm,
        spark=spark,
        mode=mode,
        margin=margin,
        min_benefit=min_benefit,
        optimized=optimized,
    )
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


def dphyp_sql(
    spark: SparkSession, sql: str, mode: str = "always"
) -> DataFrame:
    """``spark.sql`` with the DPhyp join order pinned — the product
    entry (reorder/mod.rs:24-33 analog). Result-identical to
    ``spark.sql(sql)`` by construction (inner joins commute; only the
    FROM nesting changes); falls back to the original text whenever
    the shape is unsupported. ``mode="auto"`` applies the cost gate
    (see :func:`dphyp_rewrite`) — the default-on posture."""
    text, _ = dphyp_rewrite(spark, sql, mode=mode)
    return spark.sql(text)
