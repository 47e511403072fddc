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
    # 22/22, matching the reference's reflect.rs round-trip: q11's
    # localCheckpoint pin reflects through the barrier via
    # reflect_checkpoint's registered pre-checkpoint plan; q21's
    # buried-alias shape reflects since the renderer learned to
    # flatten pass-through Project/Filter chains over joins and hoist
    # the filters into the enclosing WHERE.
    assert len(ok) == 22, f"reflectable TPC-H coverage shrank: {sorted(ok)}"


#: Families that MUST reflect (round-7 coverage growth: all six
#: setops, the window family, quantified ANY/ALL, grouping sets /
#: rollup / cube with GROUPING() marker re-spelling, VALUES literal
#: tables, range(), inlined temp views). A name dropping out of this
#: list is a reflection regression, not an acceptable skip.
MUST_REFLECT = [
    "setop_union_all",
    "setop_union_distinct",
    "setop_except_all",
    "setop_except_distinct",
    "setop_intersect_all",
    "setop_intersect_distinct",
    "limit_offset",
    "topk_fused",
    "window_frames",
    "window_rank",
    "window_agg_per_group",
    "window_distribution",
    "quantified_cmp",
    "mark_join_q",
    "cross_join_q",
    "rollup_agg",
    "cube_agg",
    "grouping_sets_agg",
    "cast_matrix",        # VALUES literal table under a user alias
    "distinct_predicates",
    "row_select",         # range() table function
    "dialect_qualify",    # QUALIFY shim: window + filter + view inline
    "modern_aggregates",
    "scalar_funcs",       # extract-field re-spelling
    "predicates",
    "agg_distinct",
    "percentile_agg",
    "bit_ops",
    "bool_tests",
]


def test_reflection_roundtrip_micro_surfaces(spark, sf_dir):
    failures = {}
    for name in MUST_REFLECT:
        if name not in Q.QUERIES:
            continue
        df = Q.QUERIES[name](spark, sf_dir)
        try:
            if not roundtrip_equivalent(df):
                failures[name] = "reflected SQL diverged"
        except Unreflectable as e:
            failures[name] = f"Unreflectable: {str(e)[:100]}"
    assert not failures, failures


def test_known_unreflectable_shapes_still_raise(spark, sf_dir):
    # the uniqueness-guarded single join embeds an internal raise_error
    # whose analyzed arity has no parseable SQL spelling — it must
    # surface as Unreflectable, never as silently-different SQL
    with pytest.raises(Unreflectable):
        roundtrip_equivalent(Q.QUERIES["single_join_q"](spark, sf_dir))


def test_reflect_sql_is_runnable_text(spark, sf_dir):
    sql = reflect_sql(Q.QUERIES["q6"](spark, sf_dir))
    assert sql.upper().startswith("SELECT")
    assert "parquet.`" in sql  # scans render as direct parquet relations
    # and it really runs
    assert spark.sql(sql).count() == 1


@pytest.fixture(scope="module")
def _xyza(spark, tmp_path_factory):
    """Four tiny single-alias parquet tables for join-shape tests."""
    d = str(tmp_path_factory.mktemp("reflect_xyza"))
    spark.createDataFrame(
        [(i, i * 10) for i in range(5)], "xk long, xv long"
    ).write.parquet(d + "/x")
    spark.createDataFrame(
        [(i, i * 100) for i in range(5)], "yk long, yv long"
    ).write.parquet(d + "/y")
    spark.createDataFrame(
        [(i, f"z{i}") for i in range(8)], "zk long, zs string"
    ).write.parquet(d + "/z")
    spark.createDataFrame(
        [(i, f"a{i}") for i in range(8)], "ak long, av string"
    ).write.parquet(d + "/a")
    tables = {
        n: spark.read.parquet(f"{d}/{n}").alias(n) for n in ("x", "y", "z", "a")
    }
    # second scan of y under its own alias (same columns — collision bait)
    tables["y2"] = spark.read.parquet(f"{d}/y").alias("y2")
    return tables


def test_no_hoist_across_outer_join_boundary(spark, _xyza):
    """Regression: a Filter buried on the null-supplying side of a LEFT
    OUTER join must NOT hoist into the top-level WHERE (that filters
    out the preserved null-extended rows). The renderer merges it into
    the inner INNER join's ON instead — exact semantics, aliases kept
    in scope."""
    import pyspark.sql.functions as F

    t = _xyza
    inner = (
        t["x"]
        .join(t["y"], F.col("xk") == F.col("yk"))
        .filter(F.col("xv") >= 20)
        .join(t["z"], F.col("xk") == F.col("zk"))
    )
    df = t["a"].join(inner, F.col("ak") == F.col("xk"), "left_outer")
    sql = reflect_sql(df)
    # the filter must live inside the join fragment, not the outer WHERE
    assert "WHERE" not in sql.upper().split("LEFT OUTER JOIN")[0]
    assert roundtrip_equivalent(df)
    assert spark.sql(sql).count() == df.count() == 8  # null-extended rows kept


def test_pruning_project_between_joins_keeps_schema(spark, _xyza):
    """Regression: a column-pruning select() between two joins must not
    reflect to a wider SELECT * — the twin's schema and the duplicate-
    name check must see the PRUNED output."""
    import pyspark.sql.functions as F

    t = _xyza
    df = (
        t["x"]
        .join(t["y"], F.col("xk") == F.col("yk"))
        .select("xk", "yv")
        .join(t["z"], F.col("xk") == F.col("zk"))
    )
    assert roundtrip_equivalent(df)
    twin = spark.sql(reflect_sql(df))
    assert [f.name for f in twin.schema.fields] == ["xk", "yv", "zk", "zs"]


def test_pruning_project_dedups_would_be_ambiguous_columns(spark, _xyza):
    """A projection that drops the columns that WOULD collide across
    join sides must not raise a spurious Unreflectable: the dup check
    runs on the PRUNED output, and the explicit select list renders
    qualified refs (bare ``yk`` is ambiguous in the SQL scope because
    the pruned-away ``y.yk`` is still visible inside the inline
    fragment)."""
    import pyspark.sql.functions as F

    t = _xyza
    y2 = t["y2"]
    # left prunes away y.yk / y.yv, which collide with y2's columns
    left = t["x"].join(t["y"], F.col("xk") == F.col("yk")).select("xk", "xv")
    df = left.join(y2, left["xk"] == y2["yk"])
    assert df.columns == ["xk", "xv", "yk", "yv"]
    assert roundtrip_equivalent(df)


def test_filtered_outer_join_side_under_outer_boundary(spark, _xyza):
    """A filtered LEFT OUTER join chain on the null-supplying side of
    another LEFT OUTER join can't hoist OR ON-merge; it must either
    render a locally-filtered derived table or raise Unreflectable —
    never silently change results."""
    import pyspark.sql.functions as F

    t = _xyza
    inner = (
        t["x"]
        .join(t["y"], F.col("xk") == F.col("yk"), "left_outer")
        .filter(F.col("xk") >= 2)
    )
    df = t["a"].join(inner, F.col("ak") == F.col("xk"), "left_outer")
    try:
        assert roundtrip_equivalent(df)
    except Unreflectable:
        pass  # explicit refusal is within contract; silent change is not


def test_unreflectable_raises_not_garbage(spark, sf_dir):
    # a plan with collected-literal LogicalRDD must raise, not emit SQL
    # that silently reads the wrong thing
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(Unreflectable):
        reflect_sql(df.filter(F.col("id") > 0))
