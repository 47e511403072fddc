"""Embedding quantization — int8 storage/bandwidth compression.

A 100 TB embedding corpus at float32 is 4 bytes/dim; symmetric int8
quantization cuts storage and shuffle bandwidth 4× with ~0.3% cosine
error at typical distributions — the standard serving-index layout
(FAISS SQ8, Milvus/pgvector int8). Per-vector symmetric scheme:

    scale = max(|x_i|) / 127
    q_i   = floor(x_i / scale + 0.5)        (round-half-up, int8 range)
    x_i'  = q_i * scale                      (dequantize)

Everything is a map-side JVM expression (transform / aggregate) — no
shuffle, no UDF; the quantized column rides every downstream join at a
quarter of the bytes. floor(x+0.5) rather than round() because its
IEEE-double semantics are identical across engines (round() ties differ
between banker's and half-away implementations), which keeps the DuckDB
oracle bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# floor of a guard so an all-zero vector quantizes to zeros instead of
# dividing by zero; 1e-30 is far below any real embedding magnitude
_EPS = 1e-30


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, scale, qvec: array<int>, max_abs_err: double).

    ``max_abs_err`` is the per-vector worst-case dequantization error —
    bounded by scale/2 by construction, returned so a pipeline can
    assert quantization quality distributionally.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = (
        F.greatest(
            F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(_EPS)
        )
        / F.lit(127.0)
    )
    q = F.transform(v, lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int"))
    err = F.array_max(
        F.zip_with(
            F.col("qvec"),
            v,
            lambda qi, xi: F.abs(qi.cast("double") * F.col("scale") - xi),
        )
    )
    return (
        df.select(F.col(id_col), F.col(vec_col), scale.alias("scale"))
        .withColumn("qvec", q)
        .withColumn("max_abs_err", err)
        .drop(vec_col)
    )


def jl_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    in_dim: int = 64,
    out_dim: int = 16,
) -> DataFrame:
    """Johnson–Lindenstrauss sign-projection: (id, proj: array<double>).

    Dimensionality reduction for the ANN scale path — project a d-dim
    embedding corpus onto ``out_dim`` random ±1 directions
    (Achlioptas 2003's database-friendly JL variant) before LSH
    bucketing or coarse quantization, cutting every downstream shuffle
    and index byte by d/out_dim while preserving pairwise distances to
    within the JL bound. The projection matrix is FROZEN from md5
    (sign(i,j) = +1 iff md5_long(f"{i}:{j}") is even — the same
    engine-portable hash convention as dedup.md5_long), so any engine
    reproduces the exact same matrix with no side-channel state, and a
    DuckDB oracle can verify the projection value-for-value.

    Execution shape: ``out_dim`` zip_with/aggregate expressions over
    the vector column — entirely map-side, ZERO shuffle and zero
    Python; projecting a 100 TB corpus is a pure scan. (``fan_out``
    spreads a small/underparallel input across the cluster and no-ops
    once the scan already has enough splits, the usual production
    case.)

    Determinism: inputs are FLOOR-quantized to a 1e-6 grid and the dot
    product accumulates in exact BIGINT. floor of a double is
    tie-FREE, unlike decimal rounding — a CAST(double AS DECIMAL(25,9))
    version hash-diverged at sf0.1 when one float landed exactly on a
    1e-9 midpoint (Spark HALF_UP vs DuckDB half-even round the tie
    opposite ways; a dyadic float's decimal expansion terminates, so
    exact midpoints are real, not measure-zero). The 1e-6 grid costs
    ≤1e-6 per element — noise against the JL distortion bound — and
    buys bit-identical results on any engine/evaluation order; the
    final rescale is one exact IEEE divide+multiply on identical ints.
    """
    import hashlib
    import math

    from xngin_spark.operators.util import fan_out

    df = fan_out(df)

    scale = 1.0 / math.sqrt(out_dim)

    def sign(i: int, j: int) -> int:
        h = int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    # build the whole projection as ONE parsed SQL expression: a
    # per-element Column DSL version costs in_dim*out_dim py4j
    # round-trips just to CONSTRUCT the plan (measured 8.8s of driver
    # time at 64x16 — 4x the execution), the same lesson as
    # clustering._lit_matrix
    def dim_expr(j: int) -> str:
        signs = ",".join(
            "1L" if sign(i, j) > 0 else "-1L" for i in range(in_dim)
        )
        return (
            f"CAST(aggregate(zip_with({vec_col}, array({signs}), "
            f"(e, s) -> CAST(floor(CAST(e AS DOUBLE) * 1000000.0D) "
            f"AS BIGINT) * s), "
            f"0L, (a, x) -> a + x) AS DOUBLE) / 1000000.0D "
            f"* CAST('{scale!r}' AS DOUBLE)"
        )

    proj = F.expr(
        "array(" + ",".join(dim_expr(j) for j in range(out_dim)) + ")"
    )
    return df.select(F.col(id_col), proj.alias("proj"))
