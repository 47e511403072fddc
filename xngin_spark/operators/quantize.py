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
