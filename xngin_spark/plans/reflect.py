"""Optimized-plan → SQL reflection: render an analyzed DataFrame plan
back to runnable Spark SQL and assert result-equivalence.

Reference parity: doradb-plan/src/lgc/reflect.rs:16 renders the
reference's optimized logical plan back to SQL text as its
plan-equivalence oracle (build plan → reflect → re-parse → same plan).
The Spark analog renders the ANALYZED logical plan (the stable,
pre-optimization shape — Catalyst's optimized plans contain nodes with
no SQL surface) to SQL, re-runs it through ``spark.sql``, and checks
the results match. That closes the same consistency loop: the
DataFrame-built plan and its SQL reflection must agree, so a
plan-construction bug that silently changes semantics is caught by its
own round trip.

Coverage is the relational core (scan/filter/project/aggregate/join/
sort/limit/offset/distinct/setops/window); nodes with no faithful SQL
rendering (Generate/Expand, streaming sources, recursive CTEs) raise
``Unreflectable`` and are reported as such by the round-trip test
rather than silently skipped. Ambiguous plans (a join whose sides share
output names, which bare-attribute SQL can't disambiguate) also raise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class Unreflectable(Exception):
    """This plan contains a node or shape with no faithful SQL render."""


def _seq(s) -> list:
    return [s.apply(i) for i in range(s.size())]


def _name(node) -> str:
    return node.getClass().getSimpleName()


class _Renderer:
    def __init__(self) -> None:
        self.n = 0
        # per-SELECT stacks of filter conditions hoisted out of
        # flattened join sides (see _side); the arm that owns the
        # enclosing SELECT pops its frame and merges into its WHERE
        self._frames: list[list[str]] = []

    def _alias(self) -> str:
        self.n += 1
        return f"__r{self.n}"

    # ---- helpers ---------------------------------------------------------

    def _from_item(self, node) -> str:
        """Render a node as something legal after FROM. A user-supplied
        DataFrame alias (SubqueryAlias) is PRESERVED: Catalyst renders
        qualified attribute references (``l1.l_orderkey``) against it,
        so replacing it with a generated alias would unresolve them."""
        if _name(node) == "SubqueryAlias":
            alias = node.alias()
            child = node.children().apply(0)
            if _name(child) == "LogicalRelation":
                return f"{self._relation(child)} AS {alias}"
            return f"({self.select(child)}) AS {alias}"
        if _name(node) == "LogicalRelation":
            return self._relation(node)
        if _name(node) == "Join":
            # joined-table fragment, parenthesized so it nests as one
            # FROM item while its side aliases stay visible to outer
            # ON/WHERE clauses (SQL scope, unlike a derived table)
            return f"({self._join_fragment(node)})"
        return f"({self.select(node)}) AS {self._alias()}"

    def _flatten_side(self, node):
        """If ``node`` is a chain of pass-through Projects / Filters
        ending at a Join, flatten it: return ``(fragment_sql,
        hoisted_conds, exposed_names)`` with the inner join rendered
        inline (its side aliases stay visible to the OUTER join's ON —
        the q21 shape: a semi-join condition referencing an alias
        buried inside the filtered left side) and the chain's filter
        conditions lifted out for the enclosing SELECT's WHERE.
        Returns None when the chain doesn't end at a Join."""
        conds: list[str] = []
        cur = node
        while True:
            k = _name(cur)
            if k == "Project" and self._is_passthrough_project(cur):
                cur = cur.children().apply(0)
                continue
            if k == "Filter":
                conds.append(cur.condition().sql())
                cur = cur.children().apply(0)
                continue
            break
        if _name(cur) != "Join":
            return None
        frag = self._join_fragment(cur)
        return f"({frag})", conds, self._outputs(cur)

    def _side(self, node, jt: str, is_left: bool):
        """Render one join side → ``(sql, exposed_names)``. Flattening
        (and thus filter hoisting into the enclosing WHERE) is only
        legal where the filter commutes with the join: a LEFT-side
        filter commutes with INNER/CROSS/LEFT SEMI/LEFT ANTI/LEFT
        OUTER (it only ever removes whole left rows); a RIGHT-side
        filter only with INNER/CROSS (for outer/semi kinds it changes
        match semantics, and its columns aren't even visible above a
        semi join)."""
        u = jt.upper()
        may_flatten = u in ("INNER", "CROSS") or (
            is_left and u in ("LEFT SEMI", "LEFT ANTI", "LEFT OUTER")
        )
        if may_flatten and self._frames:
            flat = self._flatten_side(node)
            if flat is not None:
                sql, conds, exposed = flat
                self._frames[-1].extend(conds)
                return sql, exposed
        return self._from_item(node), self._outputs(node)

    def _join_fragment(self, node) -> str:
        """Render a Join as a FROM-clause fragment (no SELECT wrapper):
        qualified references from ABOVE the join (filters/projections
        over pass-through columns) resolve only if the join's side
        aliases stay in the same query scope — wrapping every join in a
        derived table would hide them (the q21 shape)."""
        jt = node.joinType().sql()
        if "EXISTENCE" in jt.upper():
            raise Unreflectable("ExistenceJoin has no SQL surface")
        ch = node.children()
        left, lexp = self._side(ch.apply(0), jt, True)
        right, rexp = self._side(ch.apply(1), jt, False)
        dup = set(lexp) & set(rexp)
        if dup:
            raise Unreflectable(f"join sides share output names: {sorted(dup)}")
        cond = node.condition()
        if cond.isDefined():
            return f"{left} {jt} JOIN {right} ON {cond.get().sql()}"
        if jt.upper() in ("INNER", "CROSS"):
            return f"{left} CROSS JOIN {right}"
        raise Unreflectable(f"condition-less {jt} join")

    def _src(self, node) -> tuple[str, str]:
        """Render ``node`` as this SELECT's FROM source inside a fresh
        hoist frame; returns ``(src_sql, extra_where)`` where
        ``extra_where`` collects filter conditions lifted out of
        flattened join sides ('' when none). The owning arm must AND it
        into its WHERE clause."""
        self._frames.append([])
        try:
            src = (
                self._join_fragment(node)
                if _name(node) == "Join"
                else self._from_item(node)
            )
        finally:
            conds = self._frames.pop()
        return src, " AND ".join(f"({c})" for c in conds)

    @staticmethod
    def _is_passthrough_project(node) -> bool:
        """True if every projected expression is a bare attribute —
        reordering/pruning only, safe to flatten a WHERE over."""
        return all(
            _name(e) == "AttributeReference" for e in _seq(node.projectList())
        )

    def _relation(self, node) -> str:
        rel = node.relation()
        fmt = rel.fileFormat().toString().lower()
        if fmt != "parquet":
            raise Unreflectable(f"non-parquet relation: {fmt}")
        paths = _seq(rel.location().rootPaths())
        if len(paths) != 1:
            raise Unreflectable(f"multi-path relation ({len(paths)} roots)")
        return f"parquet.`{paths[0]}`"

    def _outputs(self, node) -> list[str]:
        return [a.name() for a in _seq(node.output())]

    # ---- node renderers --------------------------------------------------

    def select(self, node) -> str:  # noqa: C901 - one arm per plan node
        kind = _name(node)
        ch = node.children()

        if kind == "LogicalRelation":
            return f"SELECT * FROM {self._relation(node)}"

        if kind == "SubqueryAlias":
            return self.select(ch.apply(0))

        if kind == "ResolvedHint":
            # join-strategy hints (broadcast(dim)) shape the physical
            # plan, not the result; the reflection drops them and lets
            # CBO/AQE re-derive the strategy — result-equivalence is
            # what the round trip asserts
            return self.select(ch.apply(0))

        if kind == "Project":
            exprs = ", ".join(e.sql() for e in _seq(node.projectList()))
            child = ch.apply(0)
            if _name(child) == "OneRowRelation":
                return f"SELECT {exprs}"
            conds = []
            if _name(child) == "Filter":
                # Project(Filter(x)): same level — SELECT list and WHERE
                # share x's scope, keeping join aliases visible
                conds.append(f"({child.condition().sql()})")
                child = child.children().apply(0)
            src, extra = self._src(child)
            if extra:
                conds.append(extra)
            where = f" WHERE {' AND '.join(conds)}" if conds else ""
            return f"SELECT {exprs} FROM {src}{where}"

        if kind == "Filter":
            conds = [f"({node.condition().sql()})"]
            child = ch.apply(0)
            exprs = "*"
            if _name(child) == "Project" and self._is_passthrough_project(child):
                # Filter(passthrough-Project(x)): flatten so qualified
                # refs in the condition still see x's join aliases; a
                # computed projection can NOT flatten (SQL WHERE cannot
                # reference SELECT-list aliases) and wraps instead
                exprs = ", ".join(e.sql() for e in _seq(child.projectList()))
                child = child.children().apply(0)
            src, extra = self._src(child)
            if extra:
                conds.append(extra)
            return f"SELECT {exprs} FROM {src} WHERE {' AND '.join(conds)}"

        if kind == "Aggregate":
            groups = [e.sql() for e in _seq(node.groupingExpressions())]
            aggs = ", ".join(e.sql() for e in _seq(node.aggregateExpressions()))
            child = ch.apply(0)
            conds = []
            if _name(child) == "Filter":
                conds.append(f"({child.condition().sql()})")
                child = child.children().apply(0)
            src, extra = self._src(child)
            if extra:
                conds.append(extra)
            where = f" WHERE {' AND '.join(conds)}" if conds else ""
            sql = f"SELECT {aggs} FROM {src}{where}"
            if groups:
                sql += " GROUP BY " + ", ".join(groups)
            return sql

        if kind == "Join":
            src, extra = self._src(node)
            where = f" WHERE {extra}" if extra else ""
            return f"SELECT * FROM {src}{where}"

        if kind == "Sort":
            order = ", ".join(o.sql() for o in _seq(node.order()))
            src, extra = self._src(ch.apply(0))
            where = f" WHERE {extra}" if extra else ""
            return f"SELECT * FROM {src}{where} ORDER BY {order}"

        if kind in ("GlobalLimit", "LocalLimit"):
            n = node.limitExpr().sql()
            child = ch.apply(0)
            if kind == "GlobalLimit" and _name(child) == "LocalLimit":
                child = child.children().apply(0)
            # LIMIT must stay attached to an inner ORDER BY to preserve
            # top-k semantics (a sorted subquery's order is not
            # guaranteed to survive into the outer query)
            if _name(child) == "Sort":
                order = ", ".join(o.sql() for o in _seq(child.order()))
                src, extra = self._src(child.children().apply(0))
                where = f" WHERE {extra}" if extra else ""
                return f"SELECT * FROM {src}{where} ORDER BY {order} LIMIT {n}"
            src, extra = self._src(child)
            where = f" WHERE {extra}" if extra else ""
            return f"SELECT * FROM {src}{where} LIMIT {n}"

        if kind == "Offset":
            # Plan Offset(m, Limit(n, c)) means "rows m..n of c" (limit
            # applied FIRST); SQL `LIMIT k OFFSET m` applies the offset
            # first — so the rendered limit must shrink to n-m.
            off_sql = node.offsetExpr().sql()
            child = ch.apply(0)
            if _name(child) == "GlobalLimit":
                lim_sql = child.limitExpr().sql()
                try:
                    k = int(lim_sql) - int(off_sql)
                except ValueError as exc:
                    raise Unreflectable("non-literal LIMIT/OFFSET") from exc
                inner = child.children().apply(0)
                if _name(inner) == "LocalLimit":
                    inner = inner.children().apply(0)
                if _name(inner) == "Sort":
                    order = ", ".join(o.sql() for o in _seq(inner.order()))
                    src, extra = self._src(inner.children().apply(0))
                    where = f" WHERE {extra}" if extra else ""
                    return (
                        f"SELECT * FROM {src}{where} ORDER BY {order}"
                        f" LIMIT {max(k, 0)} OFFSET {off_sql}"
                    )
                src, extra = self._src(inner)
                where = f" WHERE {extra}" if extra else ""
                return (
                    f"SELECT * FROM {src}{where}"
                    f" LIMIT {max(k, 0)} OFFSET {off_sql}"
                )
            src, extra = self._src(child)
            where = f" WHERE {extra}" if extra else ""
            return f"SELECT * FROM {src}{where} OFFSET {off_sql}"

        if kind == "Distinct":
            src, extra = self._src(ch.apply(0))
            where = f" WHERE {extra}" if extra else ""
            return f"SELECT DISTINCT * FROM {src}{where}"

        if kind == "Deduplicate":
            keys = {a.name() for a in _seq(node.keys())}
            if keys == set(self._outputs(ch.apply(0))):
                src, extra = self._src(ch.apply(0))
                where = f" WHERE {extra}" if extra else ""
                return f"SELECT DISTINCT * FROM {src}{where}"
            raise Unreflectable("dropDuplicates on a key subset")

        if kind == "Union":
            parts = [f"({self.select(c)})" for c in _seq(ch)]
            return " UNION ALL ".join(parts)

        if kind in ("Except", "Intersect"):
            op = "EXCEPT" if kind == "Except" else "INTERSECT"
            if node.isAll():
                op += " ALL"
            left, right = self.select(ch.apply(0)), self.select(ch.apply(1))
            return f"({left}) {op} ({right})"

        if kind == "Window":
            wexprs = ", ".join(e.sql() for e in _seq(node.windowExpressions()))
            src, extra = self._src(ch.apply(0))
            where = f" WHERE {extra}" if extra else ""
            return f"SELECT *, {wexprs} FROM {src}{where}"

        if kind == "OneRowRelation":
            return "SELECT 1"

        raise Unreflectable(f"no SQL renderer for plan node {kind}")


def reflect_sql(df: DataFrame) -> str:
    """Render ``df``'s analyzed logical plan as runnable Spark SQL."""
    plan = df._jdf.queryExecution().analyzed()
    return _Renderer().select(plan)


def roundtrip_equivalent(df: DataFrame, check_rows: int = 100_000) -> bool:
    """reflect → spark.sql → order-insensitive result comparison.

    The reference asserts reflected SQL re-plans to the same plan; Spark
    SQL round-trips through the parser to a *different but equivalent*
    plan (aliasing subqueries changes the tree), so equivalence is
    checked on RESULTS: same columns, same multiset of rows.
    """
    from pyspark.errors import AnalysisException

    sql = reflect_sql(df)
    try:
        twin = df.sparkSession.sql(sql)
        twin.schema  # force analysis
    except AnalysisException as e:
        # A plan whose qualified references cross a derived-table
        # boundary the renderer could not flatten (the side-flattening
        # in _side covers the known shapes; anything left is an
        # unhandled scoping) surfaces as Unreflectable, never as a
        # silently-different query.
        raise Unreflectable(
            f"generated SQL failed analysis: {str(e).splitlines()[0][:200]}"
        ) from e
    if [f.name for f in df.schema.fields] != [f.name for f in twin.schema.fields]:
        return False
    a = df.limit(check_rows).collect()
    b = twin.limit(check_rows).collect()
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731
    return sorted(map(key, a)) == sorted(map(key, b))
