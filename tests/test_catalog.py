"""Schema-level catalog surface — create/drop schema, USE, and
schema-scoped table registration (Catalog trait,
doradb-catalog/src/lib.rs:14-46; USE, doradb-sql/src/ast.rs:1552)."""

from __future__ import annotations

import os

import pytest

from xngin_spark.catalog import Catalog


@pytest.fixture()
def cat(spark):
    c = Catalog(spark)
    yield c
    for s in ("analytics", "staging"):
        try:
            c.drop_schema(s, cascade=True)
        except Exception:
            pass
    spark.sql("USE default")


def test_create_use_drop_schema(cat):
    cat.create_schema("analytics")
    assert "analytics" in cat.schemas()
    cat.use("analytics")
    assert cat.current_schema() == "analytics"
    cat.use("default")
    cat.drop_schema("analytics")
    assert "analytics" not in cat.schemas()


def test_schema_scoped_table(cat, spark, sf_dir):
    cat.create_schema("analytics")
    cat.register("nation", os.path.join(sf_dir, "nation.parquet"), schema="analytics")
    # qualified access
    assert spark.sql("SELECT count(*) c FROM analytics.nation").first().c == 25
    # USE makes it the unqualified default
    cat.use("analytics")
    assert spark.table("nation").count() == 25
    cat.use("default")
    cat.drop_schema("analytics", cascade=True)


def test_same_name_in_two_schemas(cat, spark, sf_dir):
    cat.create_schema("analytics")
    cat.create_schema("staging")
    cat.register("region", os.path.join(sf_dir, "region.parquet"), schema="analytics")
    cat.register("region", os.path.join(sf_dir, "region.parquet"), schema="staging")
    a = spark.sql("SELECT count(*) c FROM analytics.region").first().c
    b = spark.sql("SELECT count(*) c FROM staging.region").first().c
    assert a == b == 5


def test_time_type_mapping():
    from pyspark.sql import types as T

    from xngin_spark.sources.ddl import parse_type

    assert parse_type("time") == T.TimeType()
    assert parse_type("TIME") == T.TimeType()


def test_engine_ctas_materializes_and_registers(spark, sf_dir, tmp_path):
    from xngin_spark.engine import Engine

    e = Engine(sf_dir, spark=spark)
    path = str(tmp_path / "rev_by_flag")
    df = e.ctas(
        "rev_by_flag",
        """
        SELECT l_returnflag, sum(l_quantity) AS qty
        FROM lineitem GROUP BY l_returnflag
        """,
        path,
    )
    want = {
        (r.l_returnflag, r.qty)
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg({"l_quantity": "sum"})
        .withColumnRenamed("sum(l_quantity)", "qty")
        .collect()
    }
    assert {(r.l_returnflag, r.qty) for r in df.collect()} == want
    # registered: later reads resolve through the catalog to the parquet
    assert {(r.l_returnflag, r.qty) for r in e.table("rev_by_flag").collect()} == want
    assert any(f.endswith(".parquet") for f in os.listdir(path))
    # error mode by default: re-running the same CTAS must not clobber
    with pytest.raises(Exception):
        e.ctas("rev_by_flag", "SELECT 1 AS x", path)


def test_ctas_named_events_registers_its_own_result(spark, sf_dir, tmp_path):
    # regression (review finding): Catalog.register special-cases the
    # name "events" for the driver's NTZ events table; a CTAS result
    # that merely shares the name must register the written table, not
    # re-read dirname(path)/events.parquet
    from xngin_spark.engine import Engine

    e = Engine(sf_dir, spark=spark)
    path = str(tmp_path / "my_events")
    df = e.ctas(
        "events", "SELECT 1 AS a, 2 AS b", path, mode="overwrite"
    )
    assert [tuple(r) for r in e.table("events").collect()] == [(1, 2)]
    assert [tuple(r) for r in df.collect()] == [(1, 2)]
    # restore the real events view for other tests in this session
    e.catalog.register("events", f"{sf_dir}/events.parquet")
