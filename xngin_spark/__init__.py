"""xngin_spark — a PySpark-native analytics engine with the query surface of
jiangzhe/xngin (DoraDB).

The reference (/root/reference) is a front-heavy native engine: parser,
logical planner, rule optimizer and join reordering exist, but the physical
executor was never built (doradb-server/src/mysql/session.rs:93 `todo!()`).
This package reproduces the *semantic surface* those layers define —
the logical operator algebra (doradb-plan/src/lgc/op.rs:162-216), the
scalar/predicate/aggregate function inventory (doradb-expr/src), and the
TPC-H query corpus (doradb-tpch-tests) — executed for real on Spark:
DataFrame/SQL plans optimized by Catalyst, run by Tungsten.

Layout:
    session    SparkSession factory tuned for analytics (AQE, pushdown).
    catalog    table registry over parquet dirs (Catalog trait analog).
    engine     facade: sql()/table()/query entry points.
    dialect    MySQL-ish SQL shims (XOR, DIV, IS TRUE) -> Spark SQL.
    plans      logical-operator combinators (Proj/Filt/Aggr/Join/Setop/...).
    functions  scalar & predicate & aggregate function surface.
    queries    executable query corpus (adapted TPC-H + operator micros +
               data-pipeline queries) with DuckDB oracle SQL.
    operators  beyond-reference large-scale ops: dedup, similarity,
               text stats, multimodal plumbing.
    streaming  windowed/sessionized event processing, batch + streaming.
"""

__version__ = "0.1.0"

from xngin_spark.session import get_spark  # noqa: F401
from xngin_spark.engine import Engine  # noqa: F401
