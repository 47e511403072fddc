"""sources/: schema-pinned readers, partitioned & bucketed writers.

Scale-relevant assertions: partition pruning visible in the plan for
partitioned parquet; bucketed-by-key join plans with NO Exchange
(the pre-shuffled co-location path for fact-fact joins).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xngin_spark.sources import (
    read_csv,
    read_json,
    read_parquet,
    read_tbl,
    schema_for,
    write_bucketed_table,
    write_parquet,
)


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_read_parquet_prune_pushdown(spark, sf_dir):
    df = read_parquet(
        spark,
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
        where=F.col("l_quantity") > 30,
    )
    p = plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in p
    # column pruning: only the two referenced columns reach the scan
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema and "l_shipdate" not in read_schema


def test_read_tbl_dbgen_format(spark, tmp_path):
    raw = tmp_path / "region.tbl"
    raw.write_text(
        "0|AFRICA|lar deposits blithe|\n1|AMERICA|hs use ironic requests|\n"
    )
    df = read_tbl(spark, str(raw), "region")
    rows = {r.r_regionkey: r.r_name for r in df.collect()}
    assert rows == {0: "AFRICA", 1: "AMERICA"}
    assert df.columns == [f.name for f in schema_for("region").fields]


def test_read_csv_failfast_and_types(spark, tmp_path):
    f = tmp_path / "t.csv"
    f.write_text("1,2.50,2024-01-02\n3,4.25,2024-02-03\n")
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("amount", T.DecimalType(18, 2)),
            T.StructField("d", T.DateType()),
        ]
    )
    df = read_csv(spark, str(f), schema)
    assert df.dtypes == [("k", "int"), ("amount", "decimal(18,2)"), ("d", "date")]
    assert df.count() == 2


def test_read_json_schema_pinned(spark, tmp_path):
    f = tmp_path / "t.jsonl"
    f.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    df = read_json(spark, str(f), schema, columns=["a"])
    assert df.columns == ["a"]
    assert sorted(r.a for r in df.collect()) == [1, 2]


def test_write_parquet_partitioned_prunes(spark, sf_dir, tmp_path):
    src = read_parquet(spark, os.path.join(sf_dir, "orders.parquet")).withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_parquet(src, out, partition_by=["o_year"], mode="overwrite")
    # one directory per year on disk
    years = {d for d in os.listdir(out) if d.startswith("o_year=")}
    assert len(years) > 1
    back = read_parquet(spark, out, where=F.col("o_year") == 1996)
    # partition-pruned scan: only the matching directory is read
    p = plan(back)
    assert "PartitionFilters" in p
    assert back.count() == src.filter(F.col("o_year") == 1996).count()


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    oo = read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
    ll = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed_table(
        oo, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
        path=str(wh / "b_orders"),
    )
    write_bucketed_table(
        ll, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"],
        path=str(wh / "b_lineitem"),
    )
    yield "b_orders", "b_lineitem"
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    o_t, l_t = bucketed_pair
    # AQE would wrap the plan; disable locally to read the static plan,
    # and disable broadcast so the join is eligible for SMJ bucketing.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = spark.table(l_t).join(
            spark.table(o_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        p = plan(j)
        assert "Exchange" not in p, p
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_insert_dml_paths(spark, sf_dir, tmp_path):
    from xngin_spark.sources.writers import insert_into

    spark.sql("DROP TABLE IF EXISTS dml_region")
    src = read_parquet(spark, os.path.join(sf_dir, "region.parquet"))
    src.write.option("path", str(tmp_path / "dml_region")).saveAsTable("dml_region")
    try:
        n0 = spark.table("dml_region").count()
        # INSERT INTO ... VALUES (SQL form the reference parses)
        spark.sql("INSERT INTO dml_region VALUES (99, 'TESTREGION')")
        # INSERT INTO ... SELECT (programmatic, by name)
        insert_into(
            spark.sql("SELECT 100 AS r_regionkey, 'TESTREGION2' AS r_name"),
            "dml_region",
        )
        assert spark.table("dml_region").count() == n0 + 2
        got = {
            r.r_regionkey
            for r in spark.table("dml_region").filter(F.col("r_regionkey") >= 99).collect()
        }
        assert got == {99, 100}
    finally:
        spark.sql("DROP TABLE IF EXISTS dml_region")


# --- copy-on-write UPDATE / DELETE (sources/dml.py) ----------------------


@pytest.fixture()
def cow_table(spark, sf_dir, tmp_path):
    # several files so the CoW claim ("only affected files rewrite") is
    # actually observable
    path = str(tmp_path / "orders_cow")
    src = read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
    src.repartitionByRange(4, "o_orderkey").write.parquet(path)
    return path


def test_update_rewrites_only_affected_files(spark, cow_table):
    from xngin_spark.sources.dml import update_table

    before = {f: os.stat(os.path.join(cow_table, f)).st_ino
              for f in os.listdir(cow_table) if f.endswith(".parquet")}
    assert len(before) == 4
    n0 = spark.read.parquet(cow_table).count()
    lo = spark.read.parquet(cow_table).agg(F.min("o_orderkey")).first()[0]
    stats = update_table(
        spark, cow_table,
        {"o_orderstatus": "X"},
        F.col("o_orderkey") == lo,
    )
    assert stats == {"files_rewritten": 1, "rows_updated": 1}
    after = {f: os.stat(os.path.join(cow_table, f)).st_ino
             for f in os.listdir(cow_table) if f.endswith(".parquet")}
    untouched = set(before) & set(after)
    assert len(untouched) == 3  # 3 of 4 files kept byte-identical
    assert all(before[f] == after[f] for f in untouched)
    got = spark.read.parquet(cow_table)
    assert got.filter(F.col("o_orderstatus") == "X").count() == 1
    assert got.count() == n0  # UPDATE never changes cardinality
    # schema preserved exactly
    assert got.schema == read_parquet(spark, cow_table).schema


def test_update_casts_literal_to_column_type(spark, cow_table):
    from xngin_spark.sources.dml import update_table

    t0 = spark.read.parquet(cow_table).schema["o_totalprice"].dataType
    update_table(spark, cow_table, {"o_totalprice": 0}, "o_orderkey % 2 = 0")
    assert spark.read.parquet(cow_table).schema["o_totalprice"].dataType == t0


def test_update_unknown_column_rejected(spark, cow_table):
    from xngin_spark.sources.dml import update_table

    with pytest.raises(ValueError, match="unknown columns"):
        update_table(spark, cow_table, {"nope": 1}, "o_orderkey = 1")


def test_delete_from_table(spark, cow_table):
    from xngin_spark.sources.dml import delete_from_table

    n0 = spark.read.parquet(cow_table).count()
    k = spark.read.parquet(cow_table).agg(F.max("o_orderkey")).first()[0]
    stats = delete_from_table(spark, cow_table, F.col("o_orderkey") == k)
    assert stats["rows_deleted"] == 1 and stats["files_rewritten"] == 1
    got = spark.read.parquet(cow_table)
    assert got.count() == n0 - 1
    assert got.filter(F.col("o_orderkey") == k).count() == 0
    # no-match DELETE is a metadata-only no-op
    assert delete_from_table(spark, cow_table, "o_orderkey = -42") == {
        "files_rewritten": 0,
        "rows_deleted": 0,
    }


def test_ensure_bucketed_rebuilds_on_source_change(spark, tmp_path):
    # the staleness guard protects CORRECTNESS: regenerated testdata
    # must invalidate persisted bucketed twins, or bucketed queries
    # silently serve a previous round's rows
    import os
    import shutil

    from xngin_spark.queries import bucketed as B

    sf = str(tmp_path / "sf_mini")
    os.makedirs(sf)
    src = spark.range(100).selectExpr(
        "id AS o_orderkey", "CAST(id % 7 AS LONG) AS o_custkey"
    )
    src.coalesce(1).write.parquet(f"{sf}/orders.parquet")
    # lineitem twin builds too — give it a minimal source
    spark.range(100).selectExpr(
        "id AS l_orderkey", "CAST(id AS LONG) AS l_partkey"
    ).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")

    mapping = B.ensure_bucketed(spark, sf)
    t = mapping["orders"]
    assert spark.table(t).count() == 100

    # regenerate the source with DIFFERENT content (as the driver does)
    shutil.rmtree(f"{sf}/orders.parquet")
    spark.range(250).selectExpr(
        "id AS o_orderkey", "CAST(id % 7 AS LONG) AS o_custkey"
    ).coalesce(1).write.parquet(f"{sf}/orders.parquet")
    B._ENSURED.clear()  # new driver session analog
    mapping2 = B.ensure_bucketed(spark, sf)
    assert spark.table(mapping2["orders"]).count() == 250, (
        "stale bucketed twin served after source regeneration"
    )

    # unchanged source re-registers WITHOUT rebuilding (marker matches):
    # capture the data-file inode set and assert it survives
    loc = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
        mapping2["orders"],
    )
    inodes_before = {
        os.stat(os.path.join(loc, f)).st_ino
        for f in os.listdir(loc)
        if f.endswith(".parquet") or f.startswith("part-")
    }
    B._ENSURED.clear()
    B.ensure_bucketed(spark, sf)
    inodes_after = {
        os.stat(os.path.join(loc, f)).st_ino
        for f in os.listdir(loc)
        if f.endswith(".parquet") or f.startswith("part-")
    }
    assert inodes_before == inodes_after, "unchanged source was rebuilt"

    # a memo HIT must still notice a regenerated source: same live
    # application, NO _ENSURED.clear() — the fingerprint check on the
    # hit path is what protects a long-lived session
    shutil.rmtree(f"{sf}/orders.parquet")
    spark.range(300).selectExpr(
        "id AS o_orderkey", "CAST(id % 7 AS LONG) AS o_custkey"
    ).coalesce(1).write.parquet(f"{sf}/orders.parquet")
    mapping3 = B.ensure_bucketed(spark, sf)
    assert spark.table(mapping3["orders"]).count() == 300, (
        "memoized ensure_bucketed served stale twins after source regeneration"
    )


def test_merge_into_upsert(spark, cow_table):
    from xngin_spark.sources.dml import merge_into

    t0 = spark.read.parquet(cow_table)
    n0 = t0.count()
    lo, hi = t0.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    before = {f: os.stat(os.path.join(cow_table, f)).st_ino
              for f in os.listdir(cow_table) if f.endswith(".parquet")}
    # source: replace the lowest key's row, insert one brand-new key
    src = spark.createDataFrame(
        [(int(lo),), (int(hi) + 1000,)], "o_orderkey long"
    ).join(t0.filter(F.col("o_orderkey") == lo).drop("o_orderkey").limit(1).crossJoin(
        spark.range(1).select(F.lit(1).alias("_one"))).drop("_one"), how="cross"
    ) if False else spark.createDataFrame(
        [tuple([int(lo) if c == "o_orderkey" else
                ("MERGED" if c == "o_orderstatus" else r[c])
                for c in t0.columns])
         for r in t0.filter(F.col("o_orderkey") == lo).collect()]
        + [tuple([int(hi) + 1000 if c == "o_orderkey" else
                  ("NEW" if c == "o_orderstatus" else r[c])
                  for c in t0.columns])
           for r in t0.filter(F.col("o_orderkey") == hi).collect()],
        t0.schema,
    )
    stats = merge_into(spark, cow_table, src, on="o_orderkey")
    assert stats["rows_updated"] == 1 and stats["rows_inserted"] == 1
    assert stats["files_rewritten"] == 1  # range-partitioned: lo lives in 1 file
    after = {f: os.stat(os.path.join(cow_table, f)).st_ino
             for f in os.listdir(cow_table) if f.endswith(".parquet")}
    untouched = set(before) & set(after)
    assert len(untouched) == 3 and all(before[f] == after[f] for f in untouched)
    got = spark.read.parquet(cow_table)
    assert got.count() == n0 + 1
    assert got.filter(F.col("o_orderkey") == lo).collect()[0].o_orderstatus == "MERGED"
    assert got.filter(F.col("o_orderkey") == int(hi) + 1000).count() == 1


def test_merge_into_skip_and_dup_guard(spark, cow_table):
    import pytest as _pytest

    from xngin_spark.sources.dml import merge_into

    t0 = spark.read.parquet(cow_table)
    n0 = t0.count()
    lo = t0.agg(F.min("o_orderkey")).first()[0]
    status0 = t0.filter(F.col("o_orderkey") == lo).collect()[0].o_orderstatus
    src = spark.createDataFrame(
        [tuple([int(lo) if c == "o_orderkey" else
                ("SHOULD_NOT_LAND" if c == "o_orderstatus" else r[c])
                for c in t0.columns])
         for r in t0.filter(F.col("o_orderkey") == lo).collect()],
        t0.schema,
    )
    stats = merge_into(spark, cow_table, src, on="o_orderkey", when_matched="skip")
    assert stats == {"files_rewritten": 0, "rows_updated": 0, "rows_inserted": 0}
    got = spark.read.parquet(cow_table)
    assert got.count() == n0
    assert got.filter(F.col("o_orderkey") == lo).collect()[0].o_orderstatus == status0

    dup_src = src.union(src)
    with _pytest.raises(ValueError, match="duplicate keys"):
        merge_into(spark, cow_table, dup_src, on="o_orderkey")


def test_dynamic_partition_overwrite_leaves_siblings(spark, tmp_path):
    """Backfilling one partition must not clobber the others: dynamic
    overwrite rewrites only the partitions present in the incoming
    frame; untouched sibling partition files keep their inodes."""
    import os

    from xngin_spark.sources.writers import write_parquet

    path = str(tmp_path / "part_tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "id long, part string, v long",
    )
    write_parquet(base, path, partition_by=["part"], mode="overwrite")

    def inodes(p):
        out = {}
        for root, _, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    fp = os.path.join(root, f)
                    out[fp] = os.stat(fp).st_ino
        return out

    before = {p: i for p, i in inodes(path).items() if "part=b" in p or "part=c" in p}
    assert before, "sibling partitions missing after initial write"

    patch = spark.createDataFrame([(9, "a", 99)], "id long, part string, v long")
    write_parquet(
        patch, path, partition_by=["part"], mode="overwrite",
        dynamic_partition_overwrite=True,
    )
    after = {p: i for p, i in inodes(path).items() if "part=b" in p or "part=c" in p}
    assert after == before, "dynamic overwrite touched sibling partitions"
    got = {(r.part, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {("a", 99), ("b", 30), ("c", 40)}  # a replaced, b/c intact

    # static overwrite (the default) clobbers the whole root
    write_parquet(patch, path, partition_by=["part"], mode="overwrite")
    assert {r.part for r in spark.read.parquet(path).collect()} == {"a"}

    import pytest

    with pytest.raises(ValueError):
        write_parquet(patch, path, dynamic_partition_overwrite=True)


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC as a second columnar source: byte-identical rows after a
    round trip, and filter pushdown reaches the ORC scan just like
    parquet (PushedFilters in the formatted plan)."""
    from xngin_spark.sources.readers import read_orc

    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(path)

    got = read_orc(
        spark, path,
        columns=["o_orderkey", "o_custkey"],
        where="o_custkey < 100",
    )
    want = src.filter("o_custkey < 100").select("o_orderkey", "o_custkey")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_custkey" in plan.split("PushedFilters")[1][:120]
    assert "ReadSchema: struct<o_orderkey" in plan  # column pruning reached the scan
