"""Analytic-suite properties that the oracle-parity gate can't express:
sketch error bounds and approx-vs-exact percentile agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from xngin_spark.queries import QUERIES, load_all
from xngin_spark.queries.tpch import T

load_all()


def test_approx_distinct_error_bound(spark, sf_dir):
    # HLL++ at rsd=0.02 — allow 3 sigma; also sanity: exact > 0
    rows = QUERIES["approx_distinct"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_cust > 0
        rel_err = abs(r.approx_cust - r.exact_cust) / r.exact_cust
        assert rel_err <= 0.06, f"{r.o_orderstatus}: rel_err={rel_err:.4f}"


def test_percentile_approx_matches_exact_on_integers(spark, sf_dir):
    # l_quantity takes integer values 1..50: the exact interpolated p50
    # and percentile_approx (accuracy=10000) must land within one unit
    exact = {
        r.l_returnflag: r.p50 for r in QUERIES["percentile_agg"](spark, sf_dir).collect()
    }
    li = T(spark, sf_dir, "lineitem")
    approx = {
        r.l_returnflag: r.ap50
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(F.col("l_quantity").cast("double"), 0.5, 10000).alias(
                "ap50"
            )
        )
        .collect()
    }
    assert set(exact) == set(approx)
    for k, v in exact.items():
        assert abs(approx[k] - v) <= 1.0, f"{k}: exact={v} approx={approx[k]}"


def test_hll_sketch_merge_equals_direct(spark, sf_dir):
    from pyspark.sql import functions as F

    from xngin_spark.queries import QUERIES

    rows = QUERIES["hll_partitioned_distinct"](spark, sf_dir).collect()
    by_src = {r.source: r for r in rows}
    assert "__ALL__" in by_src and len(by_src) > 2
    for r in rows:  # HLL at default lgConfigK: well under 6% here
        assert abs(r.est_distinct - r.exact_distinct) <= max(
            0.06 * r.exact_distinct, 2
        ), r
    # mergeability: union of per-source sketches tracks the direct
    # whole-table sketch (not bit-equal: DataSketches' union operator
    # targets HLL_8 while the direct aggregate may stay in a sparse/
    # HLL_4 mode, so estimates differ within sketch error)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    direct = d.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.xxhash64("text"))).alias("e")
    ).collect()[0].e
    merged = by_src["__ALL__"].est_distinct
    assert abs(merged - direct) <= max(0.02 * direct, 2), (merged, direct)
