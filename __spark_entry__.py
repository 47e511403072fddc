"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (adapted TPC-H Q1) at sf0.001.
queries()      -> every implemented query/operator from SURVEY.md §2.
oracle_sql()   -> DuckDB-equivalent SQL per query (correctness gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registries():
    from xngin_spark import queries as q

    q.load_all()
    return q.QUERIES, q.ORACLE


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    queries, _ = _registries()
    return queries["q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = _registries()
    return dict(qs)


def oracle_sql() -> dict[str, str]:
    _, oracle = _registries()
    return dict(oracle)
