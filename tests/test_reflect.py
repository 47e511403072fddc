"""Plan → SQL reflection round trip (the reference's consistency
oracle, doradb-plan/src/lgc/reflect.rs:16 — see plans/reflect.py).

Every DataFrame-built TPC-H query whose plan has a SQL surface must
produce IDENTICAL results when rendered back to SQL and re-run through
spark.sql. Queries with no SQL surface (LogicalRDD from collected
scalar-subquery literals, ExistenceJoin) are asserted to raise
Unreflectable — never silently skipped — and the reflectable coverage
count is pinned so a renderer regression can't shrink it quietly.
"""

from __future__ import annotations

import pytest

from xngin_spark import queries as Q
from xngin_spark.plans.reflect import (
    Unreflectable,
    reflect_sql,
    roundtrip_equivalent,
)

Q.load_all()

TPCH = [f"q{i}" for i in range(1, 23)]


def _attempt(spark, sf_dir, name):
    from pyspark.errors import AnalysisException

    df = Q.QUERIES[name](spark, sf_dir)
    try:
        return "ok" if roundtrip_equivalent(df) else "mismatch"
    except Unreflectable:
        return "unreflectable"
    except AnalysisException as e:
        # generated SQL failed to analyze — a renderer bug, reported
        # with the query name instead of a wall of JVM stack trace
        return f"mismatch (analysis: {str(e).splitlines()[0][:120]})"


def test_tpch_reflection_roundtrip(spark, sf_dir):
    results = {name: _attempt(spark, sf_dir, name) for name in TPCH}
    mismatched = {n: r for n, r in results.items() if r.startswith("mismatch")}
    assert not mismatched, f"reflected SQL changed results: {mismatched}"
    ok = [n for n, r in results.items() if r == "ok"]
    # Out of SQL surface by design: q11 only (its localCheckpoint
    # materializes the shared per-part aggregate into a LogicalRDD —
    # data, not a plan). q21's buried-alias shape reflects since the
    # renderer learned to flatten pass-through Project/Filter chains
    # over joins and hoist the filters into the enclosing WHERE.
    assert len(ok) >= 21, f"reflectable TPC-H coverage shrank: {sorted(ok)}"


def test_reflection_roundtrip_micro_surfaces(spark, sf_dir):
    # one representative per rendered node kind beyond TPC-H coverage:
    # setops, distinct, window, offset, cross join
    names = [
        "setop_union_all",
        "setop_except_distinct",
        "setop_intersect_distinct",
        "limit_offset",
        "window_frames",
    ]
    for name in names:
        if name not in Q.QUERIES:
            continue
        df = Q.QUERIES[name](spark, sf_dir)
        try:
            assert roundtrip_equivalent(df), f"{name}: reflected SQL diverged"
        except Unreflectable:
            pass  # acceptable: shape has no SQL surface at this node mix


def test_reflect_sql_is_runnable_text(spark, sf_dir):
    sql = reflect_sql(Q.QUERIES["q6"](spark, sf_dir))
    assert sql.upper().startswith("SELECT")
    assert "parquet.`" in sql  # scans render as direct parquet relations
    # and it really runs
    assert spark.sql(sql).count() == 1


def test_unreflectable_raises_not_garbage(spark, sf_dir):
    # a plan with collected-literal LogicalRDD must raise, not emit SQL
    # that silently reads the wrong thing
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(Unreflectable):
        reflect_sql(df.filter(F.col("id") > 0))
