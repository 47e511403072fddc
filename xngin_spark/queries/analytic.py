"""Analytic widening beyond the reference's scalar/aggregate surface:
exact distributed percentiles, correlation/covariance, pivot/unpivot
reshaping, array-function and string-function suites.

The reference's aggregate inventory stops at count/sum/avg/min/max
(doradb-expr AggKind) and its function inventory at the FuncKind list —
these queries are the beyond-reference analytics a user of a real
warehouse expects. Every oracle reproduces the exact same arithmetic
(manual interpolation formulas, decimal-accumulated sums) so the value
hashes match bit-for-bit; no query relies on engine-specific
percentile/corr implementations whose interpolation or update order
could differ.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from xngin_spark.functions.aggregates import DEC
from xngin_spark.queries import register
from xngin_spark.queries.tpch import T

# --- exact percentiles ----------------------------------------------------

_PCTS = {"p25": 0.25, "p50": 0.5, "p90": 0.90}


@register(
    "percentile_agg",
    """
    WITH ranked AS (
      SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS v,
             CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                     ORDER BY l_quantity) AS BIGINT) - 1 AS idx,
             CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           MAX(n) AS n,
           SUM(CASE WHEN idx = CAST(floor((n - 1) * 0.25) AS BIGINT)
                    THEN v * (1.0 - ((n - 1) * 0.25 - floor((n - 1) * 0.25)))
                    WHEN idx = CAST(floor((n - 1) * 0.25) AS BIGINT) + 1
                    THEN v * ((n - 1) * 0.25 - floor((n - 1) * 0.25))
                    ELSE 0.0 END) AS p25,
           SUM(CASE WHEN idx = CAST(floor((n - 1) * 0.5) AS BIGINT)
                    THEN v * (1.0 - ((n - 1) * 0.5 - floor((n - 1) * 0.5)))
                    WHEN idx = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1
                    THEN v * ((n - 1) * 0.5 - floor((n - 1) * 0.5))
                    ELSE 0.0 END) AS p50,
           SUM(CASE WHEN idx = CAST(floor((n - 1) * 0.9) AS BIGINT)
                    THEN v * (1.0 - ((n - 1) * 0.9 - floor((n - 1) * 0.9)))
                    WHEN idx = CAST(floor((n - 1) * 0.9) AS BIGINT) + 1
                    THEN v * ((n - 1) * 0.9 - floor((n - 1) * 0.9))
                    ELSE 0.0 END) AS p90
    FROM ranked
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def percentile_agg(spark, sf_dir):
    """Exact linear-interpolated percentiles via distributed sort —
    rank each value inside its group, then each percentile is a
    weighted sum of the two bracketing ranks (identical formula in the
    oracle, so no dependence on either engine's built-in interpolation).
    One shuffle on the group key; the window sort is per-group. At
    100 TB exact percentiles are a deliberate choice — the cheap path
    is percentile_approx (t-digest, map-side mergeable), proven
    equivalent-within-error in tests/test_analytic.py."""
    li = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("v"),
        (F.row_number().over(w).cast("long") - 1).alias("idx"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    n1 = F.col("n") - 1
    aggs = [F.max("n").alias("n")]
    for name, p in _PCTS.items():
        k = F.floor(n1 * p).cast("long")
        frac = n1 * p - F.floor(n1 * p)
        aggs.append(
            F.sum(
                F.when(F.col("idx") == k, F.col("v") * (1.0 - frac))
                .when(F.col("idx") == k + 1, F.col("v") * frac)
                .otherwise(0.0)
            ).alias(name)
        )
    return ranked.groupBy("l_returnflag").agg(*aggs).orderBy("l_returnflag")


@register(
    "corr_covar",
    """
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(25,6))) AS sx,
             SUM(CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(25,6))) AS sy,
             SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)
                 AS DECIMAL(25,6))) AS sxx,
             SUM(CAST(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)
                 AS DECIMAL(25,6))) AS syy,
             SUM(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)
                 AS DECIMAL(25,6))) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
             / (n - 1), 4) AS covar,
           round(((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n)
              / (n - 1))
           / (sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                   / (n - 1))
              * sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                     / (n - 1))), 8) AS corr
    FROM s
    ORDER BY l_returnflag
    """,
)
def corr_covar(spark, sf_dir):
    """Sample covariance + Pearson correlation through exact decimal
    moment sums (same determinism policy as agg_stats: native corr uses
    order-dependent single-pass updates; the moment formula makes both
    engines do identical IEEE math on identical exact sums). Map-side
    partial-aggregatable — one narrow shuffle of 6 accumulators per
    group. Final values rounded (1e-4 / 1e-8): DuckDB's wide-decimal →
    double cast is not correctly rounded (unlike Spark's BigDecimal
    path), leaving ~1-ulp noise the round absorbs."""
    li = T(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("double")
    y = F.col("l_extendedprice").cast("double")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(DEC)).alias("sx"),
        F.sum(y.cast(DEC)).alias("sy"),
        F.sum((x * x).cast(DEC)).alias("sxx"),
        F.sum((y * y).cast(DEC)).alias("syy"),
        F.sum((x * y).cast(DEC)).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (F.col(c).cast("double") for c in ("sxx", "syy", "sxy"))
    covar = (sxy - sx * sy / n) / (n - 1)
    var_x = (sxx - sx * sx / n) / (n - 1)
    var_y = (syy - sy * sy / n) / (n - 1)
    return g.select(
        "l_returnflag",
        n,
        F.round(covar, 4).alias("covar"),
        F.round(covar / (F.sqrt(var_x) * F.sqrt(var_y)), 8).alias("corr"),
    ).orderBy("l_returnflag")


# --- reshaping: pivot / unpivot -------------------------------------------


@register(
    "pivot_wide",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def pivot_wide(spark, sf_dir):
    """Long→wide pivot with an explicit pivot-value list (skips Spark's
    extra distinct-values job and keeps the output schema static — the
    only safe shape at 100 TB, where an unbounded pivot column set is a
    driver OOM)."""
    o = T(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    # a (priority, status) combo absent from the data pivots to NULL in
    # Spark but 0 under the oracle's filtered COUNT — normalize
    return wide.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in ("F", "O", "P")],
    ).orderBy("o_orderpriority")


@register(
    "unpivot_long",
    """
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part WHERE p_partkey < 500
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS val
    FROM part WHERE p_partkey < 500
    """,
)
def unpivot_long(spark, sf_dir):
    """Wide→long unpivot (melt) — Spark's native unpivot operator; the
    oracle is its UNION ALL definition. Row-multiplying but shuffle-free:
    stays inside the scan stage."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "val")


# --- array / string function suites ---------------------------------------


@register(
    "array_ops",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
               WHERE doc_id < 500)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_toks,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           list_aggregate(toks, 'min') AS tok_min,
           list_aggregate(toks, 'max') AS tok_max,
           list_contains(toks, 'the') AS has_the,
           CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS pos_the,
           array_to_string(list_slice(toks, 1, 3), ' ') AS head3,
           array_to_string(list_sort(list_distinct(toks)), ',') AS vocab
    FROM t
    """,
)
def array_ops(spark, sf_dir):
    """Array-function surface (size/distinct/min/max/contains/position/
    slice/sort/join) — all codegen'd JVM builtins over the token array,
    no explode, no shuffle: the per-row collection algebra a document
    pipeline leans on constantly."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_min(toks).alias("tok_min"),
        F.array_max(toks).alias("tok_max"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_position(toks, "the").cast("long").alias("pos_the"),
        F.concat_ws(" ", F.slice(toks, 1, 3)).alias("head3"),
        F.concat_ws(",", F.sort_array(F.array_distinct(toks))).alias("vocab"),
    )


@register(
    "string_suite",
    """
    SELECT c_custkey,
           concat_ws('|', c_name, c_mktsegment) AS tagged,
           upper(c_mktsegment) AS seg_up,
           lower(c_name) AS name_lo,
           CAST(length(c_name) AS INTEGER) AS name_len,
           reverse(c_mktsegment) AS seg_rev,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
           rpad(c_mktsegment, 12, '.') AS seg_pad,
           replace(c_name, '#', '-') AS name_dash,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS lev_building,
           CAST(instr(c_name, '0') AS INTEGER) AS first_zero,
           repeat(substring(c_mktsegment, 1, 2), 2) AS seg2x,
           trim(rpad(c_mktsegment, 12, ' ')) AS seg_trim
    FROM customer
    WHERE c_custkey < 500
    """,
)
def string_suite(spark, sf_dir):
    """String-function surface beyond the reference's FuncKind list —
    pad/trim/case/translate/edit-distance/search/repeat, every one a
    JVM builtin inside one codegen'd projection."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    return c.select(
        "c_custkey",
        F.concat_ws("|", "c_name", "c_mktsegment").alias("tagged"),
        F.upper("c_mktsegment").alias("seg_up"),
        F.lower("c_name").alias("name_lo"),
        F.length("c_name").alias("name_len"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_pad"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dash"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_tr"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_building"),
        F.instr("c_name", "0").alias("first_zero"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 2).alias("seg2x"),
        F.trim(F.rpad("c_mktsegment", 12, " ")).alias("seg_trim"),
    )


@register(
    "window_distribution",
    """
    WITH u AS (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem
               WHERE l_orderkey < 20000)
    SELECT l_returnflag, l_orderkey,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM u
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_orderkey)
    """,
)
def window_distribution(spark, sf_dir):
    """Distribution window functions — ntile / percent_rank /
    cume_dist — over a DISTINCT (flag, orderkey) projection so the
    ORDER BY key is unique per partition: ntile splits ties by
    physical row order, which no two engines (or two runs) need to
    agree on, so determinism requires a tie-free ordering. percent_rank
    and cume_dist are value-based and deterministic regardless."""
    u = (
        T(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 20000)
        .select("l_returnflag", "l_orderkey")
        .distinct()
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_orderkey")
    return u.select(
        "l_returnflag",
        "l_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register("hll_partitioned_distinct")  # no oracle: sketch is engine-specific
def hll_partitioned_distinct(spark, sf_dir):
    """Mergeable-sketch rollup — THE 100 TB cardinality pattern: build
    one HLL sketch per partition key (here: source), then answer the
    global distinct count by MERGING the kilobyte-sized sketch binaries
    (hll_union_agg) instead of re-scanning rows. In production the
    per-partition sketches are persisted at ingest (one per day/shard)
    and every rollup query touches only sketches — cost is O(partitions),
    not O(rows). Output: per-source estimate next to the exact count,
    plus an __ALL__ row whose estimate comes purely from the merge.
    Rows-only in the gate (sketch estimates are engine-specific);
    tests/test_analytic.py bounds the error and proves merge-of-parts
    equals the direct whole-table sketch."""
    from pyspark.storagelevel import StorageLevel

    from xngin_spark.operators.dedup import track_persisted

    d = T(spark, sf_dir, "documents")
    # persist: both union branches (per-source rows AND the merged
    # __ALL__ row) consume this frame — without the pin each branch
    # re-scans and re-sketches the table (review finding: 2x the I/O
    # for a query whose point is that rollups touch only sketches);
    # released by the bench's release_persisted() drain
    per = track_persisted(
        d.groupBy("source")
        .agg(
            F.hll_sketch_agg(F.xxhash64("text")).alias("sk"),
            F.countDistinct("text").alias("exact_distinct"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    per_rows = per.select(
        "source",
        F.hll_sketch_estimate("sk").alias("est_distinct"),
        "exact_distinct",
    )
    total = (
        per.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct")
        )
        .withColumn("source", F.lit("__ALL__"))
        .crossJoin(d.agg(F.countDistinct("text").alias("exact_distinct")))
    )
    return per_rows.unionByName(
        total.select("source", "est_distinct", "exact_distinct")
    ).orderBy("source")


@register("approx_distinct")  # no oracle: HLL sketch is engine-specific
def approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) next to the exact count —
    the sketch is THE 100 TB cardinality path (map-side mergeable,
    fixed memory); tests/test_analytic.py bounds its relative error
    against the exact count. Rows-only in the gate because the sketch
    estimate is engine-specific by nature."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_cust"),
            F.countDistinct("o_custkey").alias("exact_cust"),
        )
        .orderBy("o_orderstatus")
    )
