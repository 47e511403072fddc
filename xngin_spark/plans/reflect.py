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

    def _join_fragment(self, node) -> str:
        """Render a Join as a FROM-clause fragment (no SELECT wrapper):
        qualified references from ABOVE the join (filters/projections
        over pass-through columns) resolve only if the join's side
        aliases stay in the same query scope — wrapping every join in a
        derived table would hide them (the q21 shape)."""
        self._check_join_ambiguity(node)
        jt = node.joinType().sql()
        if "EXISTENCE" in jt.upper():
            raise Unreflectable("ExistenceJoin has no SQL surface")
        ch = node.children()
        left = self._from_item(ch.apply(0))
        right = self._from_item(ch.apply(1))
        cond = node.condition()
        if cond.isDefined():
            return f"{left} {jt} JOIN {right} ON {cond.get().sql()}"
        if jt.upper() in ("INNER", "CROSS"):
            return f"{left} CROSS JOIN {right}"
        raise Unreflectable(f"condition-less {jt} join")

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

    def _check_join_ambiguity(self, node) -> None:
        lnames = self._outputs(node.children().apply(0))
        rnames = self._outputs(node.children().apply(1))
        dup = set(lnames) & set(rnames)
        if dup:
            raise Unreflectable(f"join sides share output names: {sorted(dup)}")

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
            if _name(child) == "Join":
                return f"SELECT {exprs} FROM {self._join_fragment(child)}"
            if _name(child) == "Filter":
                # Project(Filter(x)): same level — SELECT list and WHERE
                # share x's scope, keeping join aliases visible
                cond = child.condition().sql()
                inner = child.children().apply(0)
                src = (
                    self._join_fragment(inner)
                    if _name(inner) == "Join"
                    else self._from_item(inner)
                )
                return f"SELECT {exprs} FROM {src} WHERE {cond}"
            return f"SELECT {exprs} FROM {self._from_item(child)}"

        if kind == "Filter":
            cond = node.condition().sql()
            child = ch.apply(0)
            if _name(child) == "Join":
                return f"SELECT * FROM {self._join_fragment(child)} WHERE {cond}"
            if _name(child) == "Project" and self._is_passthrough_project(child):
                # Filter(passthrough-Project(x)): flatten so qualified
                # refs in the condition still see x's join aliases; a
                # computed projection can NOT flatten (SQL WHERE cannot
                # reference SELECT-list aliases) and wraps instead
                exprs = ", ".join(e.sql() for e in _seq(child.projectList()))
                inner = child.children().apply(0)
                src = (
                    self._join_fragment(inner)
                    if _name(inner) == "Join"
                    else self._from_item(inner)
                )
                return f"SELECT {exprs} FROM {src} WHERE {cond}"
            return f"SELECT * FROM {self._from_item(child)} WHERE {cond}"

        if kind == "Aggregate":
            groups = [e.sql() for e in _seq(node.groupingExpressions())]
            aggs = ", ".join(e.sql() for e in _seq(node.aggregateExpressions()))
            child = ch.apply(0)
            where = ""
            if _name(child) == "Filter":
                where = f" WHERE {child.condition().sql()}"
                child = child.children().apply(0)
            src = (
                self._join_fragment(child)
                if _name(child) == "Join"
                else self._from_item(child)
            )
            sql = f"SELECT {aggs} FROM {src}{where}"
            if groups:
                sql += " GROUP BY " + ", ".join(groups)
            return sql

        if kind == "Join":
            return f"SELECT * FROM {self._join_fragment(node)}"

        if kind == "Sort":
            order = ", ".join(o.sql() for o in _seq(node.order()))
            return f"SELECT * FROM {self._from_item(ch.apply(0))} ORDER BY {order}"

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
                inner = self._from_item(child.children().apply(0))
                return f"SELECT * FROM {inner} ORDER BY {order} LIMIT {n}"
            return f"SELECT * FROM {self._from_item(child)} LIMIT {n}"

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
                    src = self._from_item(inner.children().apply(0))
                    return (
                        f"SELECT * FROM {src} ORDER BY {order}"
                        f" LIMIT {max(k, 0)} OFFSET {off_sql}"
                    )
                return (
                    f"SELECT * FROM {self._from_item(inner)}"
                    f" LIMIT {max(k, 0)} OFFSET {off_sql}"
                )
            return f"SELECT * FROM {self._from_item(child)} OFFSET {off_sql}"

        if kind == "Distinct":
            return f"SELECT DISTINCT * FROM {self._from_item(ch.apply(0))}"

        if kind == "Deduplicate":
            keys = {a.name() for a in _seq(node.keys())}
            if keys == set(self._outputs(ch.apply(0))):
                return f"SELECT DISTINCT * FROM {self._from_item(ch.apply(0))}"
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
            return f"SELECT *, {wexprs} FROM {self._from_item(ch.apply(0))}"

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
        # Plans whose qualified references cross a derived-table
        # boundary (e.g. a semi-join ON referencing an alias buried
        # inside the filtered left side — the TPC-H q21 shape) have no
        # faithful SQL scoping. Surface as Unreflectable, never as a
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
