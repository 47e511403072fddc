"""GOO join reordering (plans/reorder.py) — the JoinGraph/Goo analog
(doradb-plan/src/join/reorder/greedy.rs). Pure-number order tests plus
executable graph-join equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xngin_spark.plans.reorder import (
    CrossJoinNotSupported,
    Edge,
    goo_join,
    goo_order,
    tree_cost,
)


def E(a, b, *on):
    return Edge(a, b, tuple(on))


def test_goo_star_joins_smallest_dim_first():
    rows = {"fact": 1e6, "d_small": 10, "d_mid": 1000, "d_big": 100000}
    edges = [
        E("fact", "d_small", ("fk1", "k1")),
        E("fact", "d_mid", ("fk2", "k2")),
        E("fact", "d_big", ("fk3", "k3")),
    ]
    trace = goo_order(rows, edges)
    merged_dims = [sorted(ca | cb) for ca, cb, _ in trace]
    # greedy merges the most selective (smallest) dimension first
    assert "d_small" in merged_dims[0]
    assert "d_mid" in merged_dims[1]
    assert "d_big" in merged_dims[2]


def test_goo_chain_is_connected_and_deterministic():
    rows = {"a": 1000, "b": 10, "c": 1000}
    edges = [E("a", "b", ("ak", "bk")), E("b", "c", ("bk2", "ck"))]
    t1 = goo_order(rows, edges)
    t2 = goo_order(rows, edges)
    assert t1 == t2  # deterministic tie-break
    assert len(t1) == 2
    # both merges go along edges: estimates stay ~10, never 1000*1000
    assert all(est <= 1000 for _, _, est in t1)


def test_goo_disconnected_raises_then_allows_cross():
    rows = {"a": 10, "b": 20, "c": 30}
    edges = [E("a", "b", ("x", "y"))]
    with pytest.raises(CrossJoinNotSupported):
        goo_order(rows, edges)
    trace = goo_order(rows, edges, allow_cross=True)
    assert len(trace) == 2
    # the cross merge happens only after the connected pair
    assert trace[-1][2] == pytest.approx(10 * 30)


def test_goo_beats_declaration_order_on_cost():
    # fact-first left-deep order forces a huge early intermediate;
    # GOO must be strictly cheaper under the SAME estimator
    rows = {"l": 600_000, "o": 150_000, "c": 15_000, "n": 25}
    edges = [
        E("l", "o", ("lo", "oo")),
        E("o", "c", ("oc", "cc")),
        E("c", "n", ("cn", "nn")),
    ]
    goo = goo_order(rows, edges)
    goo_cost = tree_cost(rows, edges, [(ca, cb) for ca, cb, _ in goo])
    # naive: merge in declaration order l+o, (lo)+c, (loc)+n
    naive_seq = []
    acc = frozenset(["l"])
    for nxt in ["o", "c", "n"]:
        naive_seq.append((acc, frozenset([nxt])))
        acc = acc | {nxt}
    naive_cost = tree_cost(rows, edges, naive_seq)
    assert goo_cost <= naive_cost


def test_goo_join_matches_ordered_join(spark):
    left = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "lk long, lgrp long"
    )
    mid = spark.createDataFrame([(i,) for i in range(3)], "mk long")
    right = spark.createDataFrame(
        [(i, f"v{i}") for i in range(3)], "rk long, rv string"
    )
    out = goo_join(
        {"left": left, "mid": mid, "right": right},
        [
            ("left", "mid", [("lgrp", "mk")]),
            ("mid", "right", [("mk", "rk")]),
        ],
    )
    expected = (
        left.join(mid, F.col("lgrp") == F.col("mk"))
        .join(right, F.col("mk") == F.col("rk"))
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_goo_join_rejects_ambiguous_columns(spark):
    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="ambiguous column"):
        goo_join({"a": a, "b": b}, [("a", "b", [("k", "k")])])


def test_goo_join_no_cartesian_in_plan(spark, sf_dir):
    from xngin_spark import queries as Q

    Q.load_all()
    df = Q.QUERIES["join_reorder_goo"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
