"""Round-9 regression tests.

Covers the round-8 ADVICE items (the _pending scope leak in the DPhyp
SQL renderer, BM25 index mid-batch crash atomicity, IVF assignment
determinism, reflect barrier-registry growth, empty-index probe) and
the round-9 verdict tasks as they land.
"""

from __future__ import annotations

import pytest

from tests.test_round8_ops import _register_tpch_views


def _rows(df):
    return sorted(map(tuple, df.collect()))


# --- ADVICE high: outer WHERE conjuncts must not cross scope boundaries ---

# An outer WHERE equality over a derived table whose join region sits
# BELOW a Window / LIMIT. Attribute exprIds flow unchanged through both,
# so pre-fix the renderer classified the outer conjunct as a join edge
# and injected it into the inner JOIN ON — filtering rows before the
# window/limit computed. Pre-fix these shapes survived only because the
# injected conjunct happened to render with the derived-table qualifier
# (invisible inside the join scope) and failed dphyp_rewrite's analysis
# check, falling back to the original text; the scope sentinel makes the
# result-identity contract structural instead of qualifier-dangle luck.

_WINDOW_SCOPE_SQL = """
SELECT * FROM (
  SELECT c_custkey, c_nationkey, l_suppkey,
         count(*) OVER () AS total_rows
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
) t
WHERE c_nationkey = l_suppkey
"""

_LIMIT_SCOPE_SQL = """
SELECT * FROM (
  SELECT c_custkey, c_nationkey, l_suppkey, l_orderkey, l_linenumber
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  ORDER BY l_orderkey, l_linenumber
  LIMIT 50
) t
WHERE c_nationkey = l_suppkey
"""


@pytest.mark.parametrize(
    "sql", [_WINDOW_SCOPE_SQL, _LIMIT_SCOPE_SQL], ids=["window", "limit"]
)
def test_dphyp_outer_where_does_not_leak_below_scope(spark, sf_dir, sql):
    from xngin_spark.plans.sqlreorder import dphyp_rewrite

    _register_tpch_views(spark, sf_dir)
    base = _rows(spark.sql(sql))
    assert base, "adversarial query must be non-empty to discriminate"
    text, _traces = dphyp_rewrite(spark, sql)
    assert _rows(spark.sql(text)) == base


def test_dphyp_inner_region_still_reorders_inside_derived_table(spark, sf_dir):
    """The scope sentinel must not disable reordering WITHIN the inner
    query: its own comma-join WHERE conjuncts are pushed at the inner
    select() entry and stay edge-eligible."""
    from xngin_spark.plans.sqlreorder import dphyp_rewrite

    _register_tpch_views(spark, sf_dir)
    # The inner select list carries a single common qualifier (customer)
    # so the renderer's derived-table alias keeps the window expression
    # resolvable; the comma-join WHERE sits directly above the join and
    # must stay edge-eligible.
    sql = """
    SELECT * FROM (
      SELECT c_custkey, c_nationkey,
             count(*) OVER (PARTITION BY c_custkey) AS cnt
      FROM customer, orders, nation
      WHERE c_custkey = o_custkey AND c_nationkey = n_nationkey
    ) t
    WHERE cnt > 0
    """
    base = _rows(spark.sql(sql))
    text, traces = dphyp_rewrite(spark, sql)
    assert traces, "inner 3-leaf comma-join region should still rewrite"
    assert _rows(spark.sql(text)) == base
