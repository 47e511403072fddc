"""Greedy Operator Ordering (GOO) join reordering — the JoinGraph analog.

Reference: the one reference subsystem previously delegated wholesale to
Catalyst — ``doradb-plan/src/join/graph.rs`` (hypergraph of ≤31
relations), ``join/reorder/greedy.rs:16`` (``Goo`` — "greedily combine
join trees such that intermediate result is minimal", building a BUSHY
tree), ``join/reorder/dphyp.rs`` (exact DP over the hypergraph) and
``join/estimate.rs`` (the ``Estimate`` trait the reorderers consult).

Division of labor with Catalyst, stated precisely:

- For SQL-entry queries (``Engine.sql`` / ``spark.sql``) Catalyst's
  CBO + AQE already reorder inner-join trees; we deliberately do NOT
  second-guess it there (SURVEY §4.2 decision, plan-asserted by
  tests/test_plan_shape.py: no CartesianProduct on q5/q21).
- For PLAN-BUILDER entry (the ``plans.*`` programmatic API, the analog
  of the reference's lgc builder), the caller supplies a join ORDER
  today. This module supplies the missing piece: give it the JOIN GRAPH
  (vertices + equi-edges, exactly what ``Join::Cross`` +
  ``JoinGraph`` carry in the reference) and it picks the order, so a
  caller can hand over an arbitrarily-ordered graph without writing a
  cartesian product by accident.

Estimation: base-table cardinalities come from Catalyst's own
optimized-plan statistics (``sizeInBytes`` — filter selectivity and
column pruning already applied, no extra jobs), and join growth uses
the System-R PK-FK independence assumption
``|X ⋈ Y| = |X|·|Y| / max(base(a), base(b))`` for an edge between base
relations a ∈ X, b ∈ Y (the key domain is the larger side). That is the
same order of sophistication as the reference's row-count ``Estimate``
(join/estimate.rs keeps per-vertex-set row estimates, no histograms).

Scale note: GOO is O(V·E) driver-side arithmetic over a dict of
numbers — nothing here touches data. The output plan still goes through
Catalyst/AQE, so runtime re-planning (broadcast demotion, skew splits)
applies on top; GOO only guarantees the DECLARED tree joins along
edges (never a cartesian) with greedily-minimal intermediate sizes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CrossJoinNotSupported(ValueError):
    """Join graph is disconnected — reorder would need a cartesian
    product (parity with doradb-plan Error::CrossJoinNotSupport,
    raised by greedy.rs:42 when edges run out before components
    merge). Pass ``allow_cross=True`` to merge leftovers smallest-first
    instead."""


@dataclass(frozen=True)
class Edge:
    """Equi-join edge between two named vertices: ``on`` is a list of
    (left_col, right_col) name pairs (all ANDed)."""

    a: str
    b: str
    on: tuple[tuple[str, str], ...]

    def cond(self):
        return [F.col(l) == F.col(r) for l, r in self.on]


@dataclass
class _Comp:
    names: frozenset[str]
    rows: float
    df: DataFrame | None = None
    order: list = field(default_factory=list)  # merge trace (for tests)


def _edge_selectivity(
    e: Edge,
    base: dict[str, float],
    ndv: dict[tuple[str, str], float] | None,
) -> float:
    """Selectivity of one equi-edge under the SHARED estimator all
    reorderers (and tree_cost) must agree on. With measured NDV
    (System-R): 1/max(ndv(a.col), ndv(b.col)) per column pair;
    fallback: 1/max(base rows) — the PK-FK guess, wrong exactly when
    the key's domain is much smaller than either table."""
    if ndv is None:
        return 1.0 / max(base[e.a], base[e.b], 1.0)
    s = 1.0
    for lcol, rcol in e.on:
        s /= max(
            ndv.get((e.a, lcol), base[e.a]),
            ndv.get((e.b, rcol), base[e.b]),
            1.0,
        )
    return s


def plan_fingerprint(df: DataFrame) -> str:
    """Stable driver-side fingerprint of a DataFrame's OPTIMIZED plan
    (canonicalized, so expression IDs — which differ every time the
    same query is re-built — don't perturb it). Used to key cached
    per-vertex statistics: two vertices over the same table but with
    DIFFERENT predicates must not share NDV/rowcount entries."""
    import hashlib

    s = df._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    return hashlib.md5(s.encode()).hexdigest()[:16]


def catalyst_rows(df: DataFrame) -> float:
    """Cardinality proxy from Catalyst's optimized-plan statistics:
    ``sizeInBytes`` after filter/prune pushdown, normalized by an
    estimated row width so magnitudes compare across tables. Costs no
    Spark jobs (pure driver-side plan analysis)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    stats = plan.stats()
    row_count = stats.rowCount()
    if row_count.isDefined():
        return float(str(row_count.get()))
    width = max(
        8 * len(df.columns), 1
    )  # bytes/row guess: Catalyst's own default per-col estimate scale
    return max(float(str(stats.sizeInBytes())) / width, 1.0)


def measure_edge_ndv(
    vertices: dict[str, DataFrame],
    edges: list[Edge],
    cache: dict[tuple[str, str], float] | None = None,
) -> dict[tuple[str, str], float]:
    """Approximate NDV for every join-key column an edge touches — ONE
    ``approx_count_distinct`` aggregate per vertex (HLL, map-side
    partials). This is the measured analog of the stats an ANALYZE pass
    would persist; pass ``cache`` (caller-owned, e.g. keyed per
    dataset) to pay each vertex once per session instead of once per
    query. Without it the naive max-base-rows key-domain guess
    mis-ranks low-cardinality equi-edges (e.g. a 25-value nationkey
    joining two 10^4-row tables looks selective but multiplies) —
    measured 9x slower plans on the q5 graph.

    ``cache`` entries are keyed by ``(plan_fingerprint, col)`` — NOT by
    vertex name: a vertex carries its query's predicates (q5 filters
    orders to one year), and a different query reusing the cache with a
    different filter on the same table name must re-measure, not reuse
    stale cardinalities. The RETURNED dict is name-keyed for the
    current graph (what goo_order/dp_order consume)."""
    cache = cache if cache is not None else {}
    touched: set[str] = set()
    want: dict[str, set[str]] = {}
    for e in edges:
        for v, c in ((e.a, [l for l, _ in e.on]), (e.b, [r for _, r in e.on])):
            touched.add(v)
            want.setdefault(v, set()).update(c)
    fp = {v: plan_fingerprint(vertices[v]) for v in touched}
    need: dict[str, set[str]] = {}
    for v, cols in want.items():
        missing = {c for c in cols if (fp[v], c) not in cache}
        if missing or (fp[v], "__rows__") not in cache:
            need[v] = missing
    if not need:
        return {
            (v, c): cache[(fp[v], c)]
            for v, cols in want.items()
            for c in cols | {"__rows__"}
        }
    # one independent job per vertex — submit them concurrently so the
    # scheduler interleaves their stages (per-job fixed overhead
    # dominates these tiny HLL aggregates; measured 3.5s -> ~1s for the
    # six-vertex q5 graph)
    from concurrent.futures import ThreadPoolExecutor

    def _one(item):
        v, cols = item
        return v, cols, (
            vertices[v].agg(
                F.count(F.lit(1)).alias("__rows__"),
                *[F.approx_count_distinct(c).alias(c) for c in sorted(cols)],
            )
        ).first()

    with ThreadPoolExecutor(max_workers=min(len(need), 8)) as ex:
        for v, cols, row in ex.map(_one, need.items()):
            # exact row count rides along for free in the same job —
            # goo_join prefers it over the sizeInBytes/width guess
            cache[(fp[v], "__rows__")] = float(row["__rows__"]) or 1.0
            for c in cols:
                cache[(fp[v], c)] = float(row[c]) or 1.0
    return {
        (v, c): cache[(fp[v], c)]
        for v, cols in want.items()
        for c in cols | {"__rows__"}
    }


def goo_order(
    rows: dict[str, float],
    edges: list[Edge],
    allow_cross: bool = False,
    ndv: dict[tuple[str, str], float] | None = None,
) -> list[tuple[frozenset, frozenset, float]]:
    """Pure GOO on numbers (no Spark): repeatedly merge the component
    pair, connected by at least one edge, whose merged estimate is
    minimal. Returns the merge sequence
    ``[(left_names, right_names, est_rows), ...]`` — deterministic via
    a (est, sorted-names) tie-break so tests can pin the trace.

    Mirrors greedy.rs:27-66: initialize singleton components, loop
    ``min_res`` edge selection, purge edges that became internal.
    """
    comps: dict[frozenset, float] = {
        frozenset([n]): float(r) for n, r in rows.items()
    }
    base = dict(rows)
    for e in edges:
        if e.a not in base or e.b not in base:
            raise KeyError(f"edge {e.a}-{e.b} references unknown vertex")
    live = list(edges)
    trace: list[tuple[frozenset, frozenset, float]] = []

    def edge_sel(e: Edge) -> float:
        return _edge_selectivity(e, base, ndv)

    def find(name: str) -> frozenset:
        for c in comps:
            if name in c:
                return c
        raise KeyError(name)

    while len(comps) > 1:
        # candidate pairs = component pairs connected by >=1 live edge;
        # ALL connecting edges contribute selectivity (the reference's
        # min_res applies every edge whose vertex sets are covered and
        # purges them together, greedy.rs:44-50)
        pair_sel: dict[tuple[frozenset, frozenset], float] = {}
        for e in live:
            ca, cb = find(e.a), find(e.b)
            if ca == cb:
                continue
            pair = (ca, cb) if tuple(sorted(ca)) < tuple(sorted(cb)) else (cb, ca)
            pair_sel[pair] = pair_sel.get(pair, 1.0) * edge_sel(e)
        best = None
        for (ca, cb), sel in pair_sel.items():
            est = comps[ca] * comps[cb] * sel
            key = (est, tuple(sorted(ca | cb)))
            if best is None or key < best[0]:
                best = (key, ca, cb, est)
        if best is None:
            if not allow_cross:
                raise CrossJoinNotSupported(
                    f"{len(comps)} disconnected components remain: "
                    f"{sorted(sorted(c) for c in comps)}"
                )
            ordered = sorted(comps.items(), key=lambda kv: (kv[1], tuple(sorted(kv[0]))))
            (ca, ra), (cb, rb) = ordered[0], ordered[1]
            best = (None, ca, cb, ra * rb)
        _, ca, cb, est = best
        trace.append((ca, cb, est))
        comps[ca | cb] = est
        del comps[ca], comps[cb]
        live = [e for e in live if find(e.a) != find(e.b)]
    return trace


def dp_order(
    rows: dict[str, float],
    edges: list[Edge],
    ndv: dict[tuple[str, str], float] | None = None,
    max_vertices: int = 12,
) -> list[tuple[frozenset, frozenset, float]]:
    """EXACT join-order DP (DPsize over connected subgraphs, Moerkotte
    & Neumann's DPccp family — the reference's dphyp.rs is the
    hypergraph member of the same family; its dpsize.rs is literally
    this) minimizing C_out (sum of intermediate result sizes) under
    the same estimator as GOO. Bitmask DP over connected vertex
    subsets: O(3^V · E) driver arithmetic, so it's capped at
    ``max_vertices`` (12 ≈ 7M steps in pure Python); larger graphs should fall back
    to :func:`goo_order` (greedy, linear), the same greedy-vs-DP split
    the reference ships. Returns the same merge-trace format as
    goo_order. Trees are BUSHY: any connected/connected split is
    considered, not just left-deep."""
    names = sorted(rows)
    if len(names) > max_vertices:
        raise ValueError(
            f"{len(names)} vertices > max_vertices={max_vertices}; "
            "use goo_order for large graphs"
        )
    idx = {n: i for i, n in enumerate(names)}
    base = {n: float(r) for n, r in rows.items()}

    def esel(e: Edge) -> float:
        return _edge_selectivity(e, base, ndv)
    emasks = [
        (1 << idx[e.a], 1 << idx[e.b], esel(e)) for e in edges
    ]
    # best[mask] = (cost, est_rows, (lmask, rmask) | None)
    best: dict[int, tuple[float, float, tuple | None]] = {
        1 << i: (0.0, base[n], None) for n, i in idx.items()
    }
    full = (1 << len(names)) - 1
    for mask in range(3, full + 1):
        if mask in best or (mask & (mask - 1)) == 0:
            continue
        # enumerate submask splits L | R = mask, L < R canonical
        sub = (mask - 1) & mask
        cand = None
        while sub:
            L, R = sub, mask ^ sub
            if L < R and L in best and R in best:
                sel, crosses = 1.0, False
                for am, bm, s in emasks:
                    if (am & L and bm & R) or (am & R and bm & L):
                        sel *= s
                        crosses = True
                if crosses:
                    cl, rl, _ = best[L]
                    cr, rr, _ = best[R]
                    est = rl * rr * sel
                    cost = cl + cr + est
                    key = (cost, est, L)
                    if cand is None or key < cand[0]:
                        cand = (key, est, (L, R))
            sub = (sub - 1) & mask
        if cand is not None:
            best[mask] = (cand[0][0], cand[1], cand[2])
    if full not in best:
        raise CrossJoinNotSupported(
            "join graph is disconnected (no edge-covered DP plan)"
        )

    def to_names(mask: int) -> frozenset:
        return frozenset(n for n, i in idx.items() if mask & (1 << i))

    trace: list[tuple[frozenset, frozenset, float]] = []

    def walk(mask: int) -> None:
        cost, est, split = best[mask]
        if split is None:
            return
        L, R = split
        walk(L)
        walk(R)
        trace.append((to_names(L), to_names(R), est))

    walk(full)
    return trace


def goo_join(
    vertices: dict[str, DataFrame],
    edges: list[Edge | tuple],
    allow_cross: bool = False,
    rows: dict[str, float] | None = None,
    ndv: dict[tuple[str, str], float] | None = None,
    measure_ndv: bool = True,
    ndv_cache: dict[tuple[str, str], float] | None = None,
) -> DataFrame:
    """Join an arbitrarily-ordered graph of DataFrames along its
    equi-edges in GOO order (bushy tree, greedily-minimal intermediate
    results). ``edges`` accepts ``Edge`` or ``(a, b, [(lcol, rcol),…])``
    tuples; ``rows`` overrides the Catalyst-stats cardinalities (for
    tests / external ANALYZE sources).

    Column names must be globally unique across vertices (the TPC-H
    prefix convention) — enforced here because join conditions are
    expressed by name after the merge.
    """
    edges = [e if isinstance(e, Edge) else Edge(e[0], e[1], tuple(map(tuple, e[2]))) for e in edges]
    seen: dict[str, str] = {}
    for vname, df in vertices.items():
        for c in df.columns:
            if c in seen:
                raise ValueError(
                    f"ambiguous column '{c}' in both {seen[c]} and {vname}; "
                    "goo_join requires globally unique column names"
                )
            seen[c] = vname
    if ndv is None and measure_ndv:
        ndv = measure_edge_ndv(vertices, edges, ndv_cache)
    est = rows or {
        n: (
            ndv[(n, "__rows__")]
            if ndv is not None and (n, "__rows__") in ndv
            else catalyst_rows(df)
        )
        for n, df in vertices.items()
    }
    trace = goo_order(est, edges, allow_cross=allow_cross, ndv=ndv)
    return _build_join(vertices, edges, trace)


def _build_join(vertices, edges, trace) -> DataFrame:
    """Materialize a merge trace as an inner-join tree (every edge
    connecting the two merged components goes into that join's ON)."""
    comp_df: dict[frozenset, DataFrame] = {
        frozenset([n]): df for n, df in vertices.items()
    }
    for ca, cb, _ in trace:
        conds = []
        for e in edges:
            if (e.a in ca and e.b in cb) or (e.a in cb and e.b in ca):
                conds.extend(e.cond())
        left, right = comp_df.pop(ca), comp_df.pop(cb)
        if conds:
            cond = conds[0]
            for c in conds[1:]:
                cond = cond & c
            comp_df[ca | cb] = left.join(right, on=cond, how="inner")
        else:
            comp_df[ca | cb] = left.crossJoin(right)
    (result,) = comp_df.values()
    return result


def dp_join(
    vertices: dict[str, DataFrame],
    edges: list[Edge | tuple],
    rows: dict[str, float] | None = None,
    ndv: dict[tuple[str, str], float] | None = None,
    measure_ndv: bool = True,
    ndv_cache: dict[tuple[str, str], float] | None = None,
    max_vertices: int = 12,
) -> DataFrame:
    """Exact-DP twin of :func:`goo_join` — same graph input, same
    stats source, C_out-OPTIMAL bushy order via :func:`dp_order`
    (dpsize.rs/dphyp.rs analog). Use for graphs up to ``max_vertices``
    relations; beyond that, GOO."""
    edges = [
        e if isinstance(e, Edge) else Edge(e[0], e[1], tuple(map(tuple, e[2])))
        for e in edges
    ]
    seen: dict[str, str] = {}
    for vname, df in vertices.items():
        for c in df.columns:
            if c in seen:
                raise ValueError(
                    f"ambiguous column '{c}' in both {seen[c]} and {vname}; "
                    "dp_join requires globally unique column names"
                )
            seen[c] = vname
    if ndv is None and measure_ndv:
        ndv = measure_edge_ndv(vertices, edges, ndv_cache)
    est = rows or {
        n: (
            ndv[(n, "__rows__")]
            if ndv is not None and (n, "__rows__") in ndv
            else catalyst_rows(df)
        )
        for n, df in vertices.items()
    }
    trace = dp_order(est, edges, ndv=ndv, max_vertices=max_vertices)
    return _build_join(vertices, edges, trace)


def tree_cost(
    rows: dict[str, float],
    edges: list[Edge],
    merge_seq: list[tuple[frozenset, frozenset]],
    ndv: dict[tuple[str, str], float] | None = None,
) -> float:
    """Sum of estimated intermediate-result sizes for a given merge
    sequence (C_out cost, the standard join-order objective). Pass the
    SAME ``ndv`` dict that produced the trace (goo_order/dp_order):
    costing a trace under a different estimator than the one that
    generated it mis-ranks orders, so the estimator is shared
    (:func:`_edge_selectivity`), not duplicated."""
    base = dict(rows)
    est: dict[frozenset, float] = {frozenset([n]): float(r) for n, r in rows.items()}
    total = 0.0
    for ca, cb in merge_seq:
        sel = 1.0
        joined = False
        for e in edges:
            if (e.a in ca and e.b in cb) or (e.a in cb and e.b in ca):
                sel *= _edge_selectivity(e, base, ndv)
                joined = True
        if not joined:
            sel = 1.0  # cartesian
        r = est[ca] * est[cb] * sel
        total += r
        est[ca | cb] = r
        del est[ca], est[cb]
    return total
