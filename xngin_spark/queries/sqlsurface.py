"""SQL-surface queries beyond the reference's parser: recursive CTEs
and LATERAL correlated subqueries, both run as literal `spark.sql`
text (path-based parquet table refs, no temp-view bookkeeping) with
DuckDB oracles exercising the same native constructs.

The reference parses plain CTEs (doradb-sql/src/ast.rs:1196-1213) but
has no RECURSIVE or LATERAL anywhere in its grammar; Spark 4 supplies
both natively, so these rows are capability bonuses a reference user
gains by switching.
"""

from __future__ import annotations

from xngin_spark.queries import register

# Spark-side text uses trunc(d,'MM') / add_months; DuckDB uses
# date_trunc + INTERVAL — same DATE month grid. Revenue uses the
# decimal-accumulate pattern (functions/aggregates.DEC) on both sides
# so the double sum is order-independent and hash-stable.


@register(
    "recursive_month_spine",
    """
    WITH RECURSIVE months(m) AS (
      SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) FROM orders
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
      WHERE m < (SELECT CAST(date_trunc('month', MAX(o_orderdate)) AS DATE)
                 FROM orders)
    ),
    agg AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    )
    SELECT months.m AS month,
           CAST(coalesce(n, 0) AS BIGINT) AS n_orders,
           coalesce(rev, CAST(0 AS DOUBLE)) AS revenue
    FROM months LEFT JOIN agg ON months.m = agg.m
    """,
)
def recursive_month_spine(spark, sf_dir):
    """Dense month spine via WITH RECURSIVE + left join: the gap-free
    time-series frame (months with zero orders appear with zeros).

    The spine bounds are hoisted into literals first — the reference's
    Attach semantics for non-correlated scalar subqueries
    (doradb-expr/src/expr.rs:42-45): a MIN/MAX subquery left inside
    the recursive step would re-scan orders on EVERY iteration
    (measured 15s vs 1.6s at sf0.1). Recursion depth = number of
    months — bounded by the data's time span, not its volume, so the
    iterative part is O(spine) while the aggregation is one shuffle."""
    orders = f"parquet.`{sf_dir}/orders.parquet`"
    lo, hi = spark.sql(
        f"SELECT trunc(MIN(o_orderdate), 'MM'), trunc(MAX(o_orderdate), 'MM')"
        f" FROM {orders}"
    ).collect()[0]
    return spark.sql(f"""
        WITH RECURSIVE months(m) AS (
          SELECT DATE'{lo}'
          UNION ALL
          SELECT add_months(m, 1) FROM months WHERE m < DATE'{hi}'
        ),
        agg AS (
          SELECT trunc(o_orderdate, 'MM') AS m,
                 COUNT(*) AS n,
                 CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS rev
          FROM {orders} GROUP BY 1
        )
        SELECT months.m AS month,
               CAST(coalesce(n, 0) AS BIGINT) AS n_orders,
               coalesce(rev, CAST(0 AS DOUBLE)) AS revenue
        FROM months LEFT JOIN agg ON months.m = agg.m
    """)


@register(
    "lateral_topk",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_nationkey = 1
    """,
)
def lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery with per-row ORDER BY ... LIMIT —
    top-2 orders per customer. Catalyst decorrelates this into a
    windowed join (no per-customer re-execution), so the lateral
    surface costs one shuffle at any scale, same as the equivalent
    row_number() formulation."""
    orders = f"parquet.`{sf_dir}/orders.parquet`"
    customer = f"parquet.`{sf_dir}/customer.parquet`"
    return spark.sql(f"""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM {customer} c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM {orders} o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_nationkey = 1
    """)


# The SAME text runs on both engines: DuckDB executes QUALIFY natively,
# the Spark side lowers it via dialect.rewrite_qualify — the dialect
# parity claim is the point of this row.
_QUALIFY_SQL = """
    SELECT c_custkey, c_nationkey, c_acctbal
    FROM customer
    QUALIFY row_number() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) <= 2
"""


@register("dialect_qualify", _QUALIFY_SQL)
def dialect_qualify(spark, sf_dir):
    """QUALIFY surface (DuckDB/Snowflake/BigQuery post-window filter):
    top-2 customers by balance per nation, written with QUALIFY and
    executed through the dialect shim's subquery lowering. One window
    shuffle on the partition key — identical physical shape to the
    hand-written row_number() subquery."""
    from xngin_spark.engine import Engine

    return Engine(sf_dir, spark=spark).sql(_QUALIFY_SQL)


# Identical text both engines: GROUP BY ALL / ORDER BY ALL are native
# in Spark 4 and DuckDB alike (the modern-SQL convenience the
# reference's grammar lacks — SelectTable.group_by is a plain expr
# list, doradb-sql/src/ast.rs:1271-1283).
_GROUP_BY_ALL_SQL = """
    SELECT c_mktsegment,
           c_nationkey % 5 AS nk_band,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS bal
    FROM customer
    GROUP BY ALL
    ORDER BY ALL
"""


@register("group_by_all", _GROUP_BY_ALL_SQL)
def group_by_all(spark, sf_dir):
    """GROUP BY ALL + ORDER BY ALL: the grouping keys are inferred from
    the non-aggregate select items — one literal SQL text runs on both
    engines. Plans identically to the explicit GROUP BY (one hash
    aggregate); the surface is the point."""
    from xngin_spark.engine import Engine

    return Engine(sf_dir, spark=spark).sql(_GROUP_BY_ALL_SQL)


_DISTINCT_PRED_SQL = """
    SELECT a, b,
           a IS DISTINCT FROM b AS dist,
           a IS NOT DISTINCT FROM b AS same
    FROM (VALUES (1, 1), (1, 2), (1, NULL), (NULL, NULL),
                 (NULL, 2)) t(a, b)
"""


@register("distinct_predicates", _DISTINCT_PRED_SQL)
def distinct_predicates(spark, sf_dir):
    """IS [NOT] DISTINCT FROM — the ANSI spelling of the reference's
    SafeEqual ``<=>`` (doradb-expr/src/pred.rs:31-58): null-safe
    comparison where NULL IS NOT DISTINCT FROM NULL is true. One
    literal text on both engines, full NULL matrix."""
    from xngin_spark.engine import Engine

    return Engine(sf_dir, spark=spark).sql(_DISTINCT_PRED_SQL)


_NAMED_WINDOW_SQL = """
    SELECT c_custkey, c_nationkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) OVER w AS DOUBLE)
             AS run_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                 ROWS UNBOUNDED PRECEDING)
"""


@register("named_window", _NAMED_WINDOW_SQL)
def named_window(spark, sf_dir):
    """WINDOW clause (named window spec shared by several functions) —
    beyond the reference's grammar, which has no window functions at
    all (`// todo: window`, doradb-sql/src/ast.rs:1278). One literal
    text on both engines; both functions share a single exchange+sort."""
    from xngin_spark.engine import Engine

    return Engine(sf_dir, spark=spark).sql(_NAMED_WINDOW_SQL)


_MODERN_AGG_SQL = """
    SELECT c_nationkey,
           CAST(count_if(c_acctbal > 5000) AS BIGINT) AS n_rich,
           bool_and(c_acctbal > -1000) AS all_above_floor,
           bool_or(c_mktsegment = 'BUILDING') AS any_building,
           max_by(c_name, c_custkey) AS latest_name,
           min_by(c_name, c_custkey) AS first_name,
           median(CAST(c_custkey AS BIGINT)) AS median_key
    FROM customer
    GROUP BY c_nationkey
"""


@register("modern_aggregates", _MODERN_AGG_SQL)
def modern_aggregates(spark, sf_dir):
    """Modern aggregate surface beyond the reference's five AggKinds
    (doradb-expr/src/expr.rs:539-545): count_if, bool_and/bool_or,
    max_by/min_by (deterministic — keyed on the unique custkey), exact
    median. One literal text on both engines; all are single-pass
    hash-aggregate shapes, no extra shuffle over a plain GROUP BY."""
    from xngin_spark.engine import Engine

    return Engine(sf_dir, spark=spark).sql(_MODERN_AGG_SQL)


_LISTAGG_SQL = """
    WITH r AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY length(text) DESC, doc_id) AS rnk
      FROM documents
    )
    SELECT source,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rnk) AS top_docs,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM r WHERE rnk <= 5
    GROUP BY source
"""


@register("listagg_ordered", _LISTAGG_SQL)
def listagg_ordered(spark, sf_dir):
    """Ordered string aggregation (LISTAGG / string_agg) — the one
    common warehouse aggregate whose naive Spark spelling is WRONG:
    collect_list's element order is partition-arrival order, so an
    ordered LISTAGG must sort inside the aggregate. Spelled here as
    collect_list of (rank, id) structs -> array_sort -> transform ->
    array_join, which keeps the whole thing one hash-aggregate pass
    (no extra shuffle beyond the GROUP BY; the per-group arrays are
    top-5-bounded, never group-sized). DuckDB oracle uses the native
    string_agg(... ORDER BY) spelling."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from xngin_spark.queries.tpch import T

    d = T(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.length("text").desc(), F.col("doc_id")
    )
    r = d.select(
        "source", "doc_id", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= 5)
    return r.groupBy("source").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rnk", "doc_id"))),
                lambda s: s["doc_id"].cast("string"),
            ),
            ",",
        ).alias("top_docs"),
        F.count(F.lit(1)).alias("n"),
    )


_PIVOT_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
       CAST(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN CAST(o_totalprice AS DECIMAL(25,6)) END)
            AS STRING) AS DOUBLE) AS urgent,
       CAST(CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                          THEN CAST(o_totalprice AS DECIMAL(25,6)) END)
            AS STRING) AS DOUBLE) AS low
FROM orders
GROUP BY 1
ORDER BY y
"""


@register("pivot_sql_syntax", _PIVOT_SQL)
def pivot_sql_syntax(spark, sf_dir):
    """Native SQL PIVOT *clause* (the DataFrame .pivot() twin is
    queries/analytic.pivot_wide): per-year revenue pivoted into one
    column per order priority — the reporting reshape every warehouse
    grows. Spark's PIVOT clause analyzes to Aggregate-with-conditional
    -aggregates (the same plan the oracle's CASE spelling produces —
    one hash-aggregate pass, no extra shuffle, no per-value scans),
    which is why the cross-engine hash can be exact: both engines run
    the identical decimal-summed conditional aggregation. Beyond the
    reference's grammar (no PIVOT in doradb-sql); a reference user
    gains it by switching."""
    orders = f"parquet.`{sf_dir}/orders.parquet`"
    return spark.sql(f"""
        SELECT * FROM (
          SELECT o_orderpriority,
                 CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
                 o_totalprice
          FROM {orders}
        ) PIVOT (
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS STRING)
               AS DOUBLE)
          FOR o_orderpriority IN ('1-URGENT' AS urgent, '5-LOW' AS low)
        ) ORDER BY y
    """)


_UNPIVOT_SQL = """
SELECT p_partkey, metric, val FROM (
  SELECT p_partkey, 'psize' AS metric, CAST(p_size AS DOUBLE) AS val
  FROM part
  UNION ALL
  SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val
  FROM part
) u
WHERE val IS NOT NULL
ORDER BY p_partkey, metric
"""


@register("unpivot_sql_syntax", _UNPIVOT_SQL)
def unpivot_sql_syntax(spark, sf_dir):
    """Native SQL UNPIVOT *clause* (the DataFrame .unpivot() twin is
    queries/analytic.unpivot_long): per-part metrics melted to
    (key, metric, value) rows — the feature-table normalization shape.
    Spark's UNPIVOT analyzes to Expand (one pass over the scan, k
    output rows per input row, no join and no shuffle); the DuckDB
    oracle spells the same relation as a UNION ALL of per-metric
    projections with an explicit ``val IS NOT NULL`` — UNPIVOT's
    default EXCLUDE NULLS drops NULL measures, so the oracle must
    too (planted-NULL equivalence pinned in tests)."""
    part = f"parquet.`{sf_dir}/part.parquet`"
    return spark.sql(f"""
        SELECT p_partkey, metric, val FROM (
          SELECT p_partkey, CAST(p_size AS DOUBLE) AS psize, p_retailprice
          FROM {part}
        ) UNPIVOT (val FOR metric IN (psize, p_retailprice))
        ORDER BY p_partkey, metric
    """)
