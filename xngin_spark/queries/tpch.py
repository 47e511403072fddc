"""Adapted TPC-H Q1–Q22 — the reference's benchmark corpus
(/root/reference/sql/tpch{1..22}.sql, parsed end-to-end by
doradb-tpch-tests/tests/{parse,build_lgc,rule_optimize}.rs) re-expressed
on the driver's simplified schema (TESTDATA.md).

Adaptation rules (documented per query):
- The driver testdata has no ``partsupp`` table and drops several
  columns (l_shipmode, l_commitdate/receiptdate, p_container, c_phone,
  addresses/comments). Queries touching those are rewritten to
  *preserve the operator shape* (same join/subquery/aggregate structure)
  over available columns.
- Filter constants are retuned to the synthetic data's actual value
  domains (dates 1995–2001, nations NATION_0..24, single-word p_type,
  brands Brand#1..25) so every query selects a meaningful subset.
- LIMIT queries get a unique trailing sort key in BOTH engines so the
  selected row set is deterministic under ties.
- Double aggregates use the deterministic decimal-accumulate pattern
  (xngin_spark.functions.aggregates) in BOTH engines.

Scale notes: joins are declared fact→dim with dims broadcast (region,
nation, supplier, part are orders of magnitude smaller than lineitem at
every SF); aggregations are expressed so Spark plans partial+final
HashAggregate; all filters sit directly on scans for parquet pushdown.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xngin_spark.functions.aggregates import DEC, count_star, davg, davg_expr, dsum, dsum_expr
from xngin_spark.plans.joins import anti_join, null_aware_anti_join, semi_join
from xngin_spark.queries import register


# Analyzed-scan cache: resolving a parquet scan re-reads file footers and
# re-runs schema resolution every time; a 68-query suite over 10 tables
# repeats that work hundreds of times for identical scans.  DataFrames
# are immutable, so reusing the analyzed relation is safe — every
# downstream transformation builds a fresh plan on top.  Keyed by the
# live session object (a restarted session gets fresh entries).
_SCAN_CACHE: dict[tuple[int, str, str], DataFrame] = {}

# (table name -> managed-table name) overrides, set temporarily by
# queries.bucketed so the physical-layout variants reuse the exact
# query definitions below against bucketed tables instead of raw
# parquet. Only consulted during DataFrame *construction* — once built,
# a plan no longer goes through T().
_TABLE_OVERRIDES: dict[str, str] = {}


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    override = _TABLE_OVERRIDES.get(name)
    if override is not None:
        return spark.table(override)
    key = (id(spark), sf_dir, name)
    df = _SCAN_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _SCAN_CACHE[key] = df
    return df


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# --------------------------------------------------------------------------
# Q1 — pricing summary report. Verbatim semantics (all columns present);
# cutoff precomputed: date '1998-12-01' - interval '90' day = 1998-09-02.
@register(
    "q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_expr("l_quantity", "sum_qty")},
           {dsum_expr("l_extendedprice", "sum_base_price")},
           {dsum_expr("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {dsum_expr("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {davg_expr("l_quantity", "avg_qty")},
           {davg_expr("l_extendedprice", "avg_price")},
           {davg_expr("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit(ts("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            count_star().alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q2 — min-cost supplier. ADAPTED: no partsupp table; the correlated
# MIN-equality subquery (the defining shape of Q2) is retargeted to
# "supplier(s) with minimum account balance within their nation, in
# EUROPE". Same structure: multi-join + correlated scalar = MIN + sort +
# limit.
@register(
    "q2",
    """
    SELECT s_acctbal, s_name, n_name, s_suppkey
    FROM supplier s, nation, region
    WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT MIN(s2.s_acctbal) FROM supplier s2
        WHERE s2.s_nationkey = s.s_nationkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, s_suppkey
    LIMIT 100
    """,
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    min_bal = s.groupBy(F.col("s_nationkey").alias("mk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .join(F.broadcast(min_bal), F.col("s_nationkey") == F.col("mk"))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "s_suppkey")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "s_suppkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q3 — shipping priority. ADAPTED: o_shippriority column absent → dropped
# from projection/grouping; date pivot retuned to 1998-07-01; l_orderkey
# added as deterministic tiebreak under LIMIT.
@register(
    "q3",
    f"""
    SELECT l_orderkey,
           {dsum_expr("l_extendedprice * (1 - l_discount)", "revenue")},
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(ts("1998-07-01"))
    )
    l = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(ts("1998-07-01"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4 — order priority checking. ADAPTED: l_commitdate/l_receiptdate
# absent → the EXISTS probe becomes "some lineitem shipped later than the
# order date" (late shipment), keeping the correlated-EXISTS → semi-join
# shape, including a non-equi conjunct.
@register(
    "q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT * FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(ts("1996-01-01")))
        & (F.col("o_orderdate") < F.lit(ts("1996-04-01")))
    )
    l = T(spark, sf_dir, "lineitem")
    probed = semi_join(
        o,
        l.select("l_orderkey", "l_shipdate"),
        [F.col("l_orderkey") == F.col("o_orderkey"), F.col("l_shipdate") > F.col("o_orderdate")],
    )
    return (
        probed.groupBy("o_orderpriority")
        .agg(count_star().alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume. Verbatim shape (6-way join, c_nationkey =
# s_nationkey co-location condition); region/dates retuned.
@register(
    "q5",
    f"""
    SELECT n_name,
           {dsum_expr("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(ts("1996-01-01")))
        & (F.col("o_orderdate") < F.lit(ts("1997-01-01")))
    )
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey))
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change. Verbatim shape (pure scan-filter-
# aggregate, fully pushed down); constants retuned to data domain
# (discount ∈ [0,0.1]).
@register(
    "q6",
    f"""
    SELECT {dsum_expr("l_extendedprice * l_discount", "revenue")}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit(ts("1996-01-01")))
            & (F.col("l_shipdate") < F.lit(ts("1997-01-01")))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping. Verbatim shape (derived table, two nation roles,
# disjunctive pair condition, EXTRACT(year)); nations retuned.
@register(
    "q7",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {dsum_expr("volume", "revenue")}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) AS shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "supplier")
    l = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(F.lit(ts("1996-01-01")), F.lit(ts("1997-12-31")))
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    shipping = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    return (
        shipping.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — national market share. Verbatim shape (8-way join, conditional
# aggregation ratio); p_type/nation/region retuned to data domain.
@register(
    "q8",
    """
    SELECT o_year,
           CAST(CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                    AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
           / CAST(CAST(SUM(CAST(volume AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
        AND p_type = 'PROMO'
    ) AS all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = T(spark, sf_dir, "supplier")
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(F.lit(ts("1996-01-01")), F.lit(ts("1997-12-31")))
    )
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    all_nations = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "nation",
        )
    )
    national = F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))
    return (
        all_nations.groupBy("o_year")
        .agg(
            (
                F.sum(national.cast(DEC)).cast("double")
                / F.sum(F.col("volume").cast(DEC)).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 — product type profit. ADAPTED: no partsupp → profit uses
# p_retailprice as the cost basis (amount = revenue − 1% of retailprice ×
# quantity); same 5-way join + LIKE + derived table + group shape.
@register(
    "q9",
    f"""
    SELECT nation, o_year, {dsum_expr("amount", "sum_profit")}
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) - 0.01 * p_retailprice * l_quantity AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%ring%'
    ) AS profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%ring%"))
    s = T(spark, sf_dir, "supplier")
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.01) * F.col("p_retailprice") * F.col("l_quantity")
    )
    profit = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return (
        profit.groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), "sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q10 — returned item reporting. ADAPTED: c_address/c_phone/c_comment
# absent → dropped; dates retuned; c_custkey tiebreak added under LIMIT.
@register(
    "q10",
    f"""
    SELECT c_custkey, c_name,
           {dsum_expr("l_extendedprice * (1 - l_discount)", "revenue")},
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(ts("1997-10-01")))
        & (F.col("o_orderdate") < F.lit(ts("1998-01-01")))
    )
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q11 — important stock identification. ADAPTED: no partsupp → "inventory
# value" becomes lineitem-quantity × part-retailprice per part; identical
# shape: join + group + HAVING against a scalar subquery of the same
# aggregate × fraction (fraction is 2/|part| so selectivity is stable
# across scale factors, unlike the original's fixed 0.0001).
@register(
    "q11",
    f"""
    SELECT p_partkey, {dsum_expr("l_quantity * p_retailprice", "inv_value")}
    FROM lineitem, part
    WHERE l_partkey = p_partkey
    GROUP BY p_partkey
    HAVING CAST(CAST(SUM(CAST(l_quantity * p_retailprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE) > (
      SELECT CAST(CAST(SUM(CAST(l_quantity * p_retailprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
             * (1.3 / (SELECT COUNT(*) FROM part))
      FROM lineitem, part WHERE l_partkey = p_partkey
    )
    ORDER BY inv_value DESC, p_partkey
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "p_partkey", (F.col("l_quantity") * F.col("p_retailprice")).alias("v")
    )
    # ONE lineitem scan: the per-part decimal sums (|part| rows, tiny)
    # are pinned and serve BOTH the HAVING threshold and the result —
    # the naive shape re-runs the fact join for the scalar subquery.
    # Decimal addition is exact and associative, so summing the per-part
    # sums equals the oracle's grand sum bit-for-bit before the double
    # cast.
    # reflect_checkpoint (not bare localCheckpoint): the pin is an
    # execution choice and must not cost the plan its SQL surface —
    # reflection substitutes the pre-checkpoint aggregate (closes the
    # q11 gap vs the reference's reflect.rs 22/22 round-trip)
    from xngin_spark.plans.reflect import reflect_checkpoint

    per_part_dec = reflect_checkpoint(
        joined.groupBy("p_partkey").agg(
            F.sum(F.col("v").cast(DEC)).alias("inv_dec")
        ),
        eager=True,
    )
    n_parts = p.count()
    threshold = per_part_dec.agg(
        F.sum("inv_dec").cast("double")
    ).collect()[0][0] * (1.3 / n_parts)
    return (
        per_part_dec.select(
            "p_partkey", F.col("inv_dec").cast("double").alias("inv_value")
        )
        .filter(F.col("inv_value") > F.lit(threshold))
        .orderBy(F.col("inv_value").desc(), "p_partkey")
    )


# --------------------------------------------------------------------------
# Q12 — shipping modes / critical orders. ADAPTED: l_shipmode and
# commit/receipt dates absent → classify by l_returnflag with lateness =
# l_shipdate > o_orderdate; same join + IN + conditional-count shape.
@register(
    "q12",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                           OR o_orderpriority = '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                          AND o_orderpriority <> '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_returnflag IN ('R', 'A')
      AND l_shipdate > o_orderdate
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit(ts("1996-01-01")))
        & (F.col("l_shipdate") < F.lit(ts("1997-01-01")))
    )
    high = (F.col("o_orderpriority") == "1-URGENT") | (
        F.col("o_orderpriority") == "2-HIGH"
    )
    return (
        l.join(o, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q13 — customer distribution. ADAPTED: o_comment absent → the join
# residual filter uses o_orderpriority; same left-outer-join +
# count-on-nullable + re-aggregation shape.
@register(
    "q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) AS c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    c_orders = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(count_star().alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q14 — promotion effect. Verbatim shape (conditional-revenue ratio);
# p_type domain is single words so LIKE 'PROMO%' matches exactly 'PROMO'.
@register(
    "q14",
    """
    SELECT 100.00 * CAST(CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
           / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(ts("1996-09-01")))
        & (F.col("l_shipdate") < F.lit(ts("1996-10-01")))
    )
    p = T(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0.0))
    return l.join(F.broadcast(p), l.l_partkey == p.p_partkey).agg(
        (
            F.lit(100.00)
            * F.sum(promo.cast(DEC)).cast("double")
            / F.sum(disc.cast(DEC)).cast("double")
        ).alias("promo_revenue")
    )


# --------------------------------------------------------------------------
# Q15 — top supplier. ADAPTED: s_address/s_phone absent → dropped. Same
# CTE + MAX-equality scalar subquery shape.
@register(
    "q15",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {dsum_expr("l_extendedprice * (1 - l_discount)", "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(ts("1996-01-01")))
        & (F.col("l_shipdate") < F.lit(ts("1996-04-01")))
    )
    s = T(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue")).collect()[0][0]
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .filter(F.col("total_revenue") == F.lit(max_rev))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 — parts/supplier relationship. ADAPTED: no partsupp → the
# part↔supplier association comes from lineitem; the NOT IN subquery
# excludes low-balance suppliers (s_comment absent). Same shape:
# join + NOT IN (null-aware anti join) + COUNT DISTINCT + multi-key group.
@register(
    "q16",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'STANDARD%'
      AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 500.0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").like("STANDARD%")
        & F.col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9)
    )
    l = T(spark, sf_dir, "lineitem")
    excluded = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 500.0).select(
        "s_suppkey"
    )
    kept = null_aware_anti_join(l, excluded, F.col("l_suppkey"), F.col("s_suppkey"))
    return (
        kept.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue. ADAPTED: p_container absent →
# brand-only filter. Same correlated-scalar-AVG shape (per-part average
# quantity threshold).
@register(
    "q17",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS STRING) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.2 * (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS STRING) AS DOUBLE)
                      / COUNT(l_quantity))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    thresholds = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("l_quantity"))).alias(
            "qty_threshold"
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q18 — large volume customers. Verbatim shape (IN over GROUP BY/HAVING
# subquery); threshold retuned to the data's per-order quantity totals;
# o_orderkey tiebreak under LIMIT.
@register(
    "q18",
    f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {dsum_expr("l_quantity", "sum_qty")}
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS STRING) AS DOUBLE) > 150
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o2 = semi_join(o, big, F.col("o_orderkey") == F.col("big_orderkey"))
    return (
        l.join(o2, l.l_orderkey == o2.o_orderkey)
        .join(c, o2.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), "sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue. ADAPTED: p_container/l_shipmode/l_shipinstruct
# absent → the three disjunctive branches keep brand + quantity-range +
# size-range conjuncts. Same shape: OR of multi-conjunct branches over a
# join (exercises disjunctive predicate pushdown).
@register(
    "q19",
    f"""
    SELECT {dsum_expr("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem, part
    WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
           AND l_quantity >= 1 AND l_quantity <= 11
           AND p_size BETWEEN 1 AND 15)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
           AND l_quantity >= 10 AND l_quantity <= 20
           AND p_size BETWEEN 1 AND 25)
       OR (p_partkey = l_partkey AND p_brand = 'Brand#24'
           AND l_quantity >= 20 AND l_quantity <= 30
           AND p_size BETWEEN 1 AND 35)
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    branch = lambda brand, qlo, qhi, slo, shi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
        & F.col("p_size").between(slo, shi)
    )
    cond = (
        branch("Brand#12", 1, 11, 1, 15)
        | branch("Brand#23", 10, 20, 1, 25)
        | branch("Brand#24", 20, 30, 1, 35)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --------------------------------------------------------------------------
# Q20 — potential part promotion. ADAPTED: no partsupp → the supplier
# candidate set comes from lineitem activity on LIKE-matched parts with a
# HAVING volume threshold. Same nested IN-subquery chain shape
# (part LIKE → link table → supplier IN).
@register(
    "q20",
    """
    SELECT s_name, n_name
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS STRING) AS DOUBLE) > 50
      )
      AND s_nationkey = n_nationkey
    ORDER BY s_name
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    parts = T(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(ts("1996-01-01")))
        & (F.col("l_shipdate") < F.lit(ts("1997-01-01")))
    )
    active = (
        semi_join(l, parts, F.col("l_partkey") == F.col("p_partkey"), broadcast=True)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    return (
        semi_join(s, active, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting. ADAPTED: receipt/commit dates
# absent → lateness is l_shipdate > o_orderdate; nation filter dropped
# (join kept). Same shape: join + EXISTS (semi) + NOT EXISTS (anti) with
# inequality correlation, group + top-k.
@register(
    "q21",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate
      AND EXISTS (
        SELECT * FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT * FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate
      )
      AND s_nationkey = n_nationkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = T(spark, sf_dir, "lineitem").alias("l1")
    lk = (
        T(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("k_orderkey"),
            F.col("l_suppkey").alias("k_suppkey"),
            F.col("l_shipdate").alias("k_shipdate"),
        )
        .alias("lk")
    )
    base = l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey).filter(
        F.col("l1.l_shipdate") > F.col("o_orderdate")
    )
    with_other = semi_join(
        base,
        lk,
        [
            F.col("k_orderkey") == F.col("l1.l_orderkey"),
            F.col("k_suppkey") != F.col("l1.l_suppkey"),
        ],
    )
    sole_late = anti_join(
        with_other,
        lk,
        [
            F.col("k_orderkey") == F.col("l1.l_orderkey"),
            F.col("k_suppkey") != F.col("l1.l_suppkey"),
            F.col("k_shipdate") > F.col("o_orderdate"),
        ],
    )
    return (
        sole_late.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(count_star().alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity. ADAPTED: c_phone absent → country code
# is the last-two-digits of c_name ('Customer#000000042' → '42'). Same
# shape: SUBSTRING + IN list + scalar AVG subquery + NOT EXISTS anti join.
@register(
    "q22",
    f"""
    SELECT cntrycode, COUNT(*) AS numcust, {dsum_expr("c_acctbal", "totacctbal")}
    FROM (
      SELECT SUBSTRING(c_name, 17, 2) AS cntrycode, c_acctbal
      FROM customer
      WHERE SUBSTRING(c_name, 17, 2) IN ('05','07','10','11','13','17','18','21','23','26','29','30','31','33','35','38','40','42','44','47')
        AND c_acctbal > (
          SELECT {davg_expr("c_acctbal", "a")}
          FROM customer
          WHERE c_acctbal > 0.00
            AND SUBSTRING(c_name, 17, 2) IN ('05','07','10','11','13','17','18','21','23','26','29','30','31','33','35','38','40','42','44','47')
        )
        AND NOT EXISTS (SELECT * FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
    ) AS custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = T(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 17, 2)
    )
    codes = ("05","07","10","11","13","17","18","21","23","26","29","30","31","33","35","38","40","42","44","47")
    in_codes = c.filter(F.col("cntrycode").isin(*codes))
    avg_bal = (
        in_codes.filter(F.col("c_acctbal") > 0.0)
        .agg(davg(F.col("c_acctbal"), "a"))
        .collect()[0][0]
    )
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(ts("2000-06-01")))
        .select("o_custkey")
    )
    no_orders = anti_join(
        in_codes.filter(F.col("c_acctbal") > F.lit(avg_bal)),
        o,
        F.col("c_custkey") == F.col("o_custkey"),
    )
    return (
        no_orders.groupBy("cntrycode")
        .agg(count_star().alias("numcust"), dsum(F.col("c_acctbal"), "totacctbal"))
        .orderBy("cntrycode")
    )
