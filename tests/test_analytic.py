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
