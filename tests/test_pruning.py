"""Partition pruning — static (filter on the partition column reaches
the directory listing) and dynamic (a selective dimension filter prunes
fact partitions at runtime via a planted DPP subquery).

These are the layout-level scan eliminations that matter most at
100 TB: a date-partitioned fact table plus DPP means a star-join query
reads only the partitions its dimension predicate selects, no matter
how large the fact table grows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xngin_spark.plans.explain import formatted_plan, partition_filters
from xngin_spark.sources.writers import write_parquet


@pytest.fixture(scope="module")
def part_orders_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("orders_part"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_parquet(o, out, partition_by=["o_orderpriority"], mode="overwrite")
    return out


def test_static_partition_pruning(spark, part_orders_dir, sf_dir):
    df = spark.read.parquet(part_orders_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pf = partition_filters(df)
    assert any("o_orderpriority" in f for f in pf), f"no partition filter: {pf}"
    # pruning must not change results: match a direct read of the one
    # partition directory (inputFiles() lists pre-pruning, so the plan
    # assertion above is the listing-level evidence)
    direct = spark.read.parquet(f"{part_orders_dir}/o_orderpriority=1-URGENT")
    assert df.count() == direct.count() > 0


def test_dynamic_partition_pruning(spark, part_orders_dir, sf_dir):
    fact = spark.read.parquet(part_orders_dir)
    # the dimension filter is on a NON-key column: a filter on the join
    # key itself would be constraint-propagated onto the fact statically,
    # and no runtime pruning would be needed. Here only executing the
    # dim side reveals which partitions survive → the optimizer must
    # plant a dynamicpruning IN-subquery on the fact scan (reusing the
    # dim's broadcast exchange, so the prune is free).
    dim = spark.createDataFrame(
        [
            ("1-URGENT", "x"),
            ("2-HIGH", "y"),
            ("3-MEDIUM", "x"),
            ("4-NOT SPECIFIED", "x"),
            ("5-LOW", "x"),
        ],
        "o_orderpriority string, grp string",
    ).filter(F.col("grp") == "y")
    joined = fact.join(dim, "o_orderpriority").groupBy("o_orderpriority").count()
    pf = partition_filters(joined)
    assert any("dynamicpruning" in f for f in pf), (
        f"DPP subquery not planted; partition filters: {pf}\n"
        f"{formatted_plan(joined)[:2000]}"
    )
    got = {r.o_orderpriority: r["count"] for r in joined.collect()}
    want = {
        r.o_orderpriority: r["count"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority") == "2-HIGH")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    assert got == want
