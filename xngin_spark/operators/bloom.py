"""Distributed Bloom filter: build as an aggregation, probe map-side.

The pretraining-pipeline use cases: benchmark-contamination screens,
"seen before" URL/document dedup across crawl snapshots, and join
pruning — anywhere an approximate set-membership test over billions of
keys beats materializing the set.

Spark-first shape (no RDDs, no UDFs):

- BUILD is one narrow aggregation: each key maps to ``k`` bit positions
  (xxhash64 with per-probe seeds), positions fold into (word, mask)
  pairs, and a groupBy(word) + bit_or reduces them — shuffle currency is
  at most ``m/64`` 16-byte rows regardless of corpus size, with
  map-side combine doing almost all the work.
- The FILTER itself is a DataFrame of (word, bits) — ``m/64`` rows.
  2^27 bits (16 MiB, ~10M keys at 1% FP) is ~2M rows: comfortably
  broadcastable, and persistable as parquet for reuse across jobs like
  the IVF index.
- PROBE is ``k`` broadcast hash joins on the word index — map-side
  only, ZERO shuffle of the probe side, so membership testing a 100 TB
  corpus is a pure scan. (A collected literal array would also work for
  tiny filters but bloats the plan; the broadcast join is the shape
  that survives m growing to RAM-scale.)

False-positive rate follows the standard bound (1 - e^{-kn/m})^k;
``optimal_params`` sizes (m, k) from (n, p). No false negatives ever —
property-tested with planted membership in tests/test_operators.py.

Reference parity: the reference has no probabilistic structures; its
exact-set analog is the hash join. Public algorithm (Bloom 1970).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 64


def optimal_params(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) minimizing memory for a target FP rate: the textbook
    m = -n ln p / (ln 2)^2, k = (m/n) ln 2 — rounded to whole words."""
    m = max(_WORD_BITS, int(-n_keys * math.log(fp_rate) / (math.log(2) ** 2)))
    m = ((m + _WORD_BITS - 1) // _WORD_BITS) * _WORD_BITS
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _bit_positions(
    col: Column, m_bits: int, k: int, portable: bool = False
) -> list[Column]:
    """k independent bit positions per key: xxhash64 seeded per probe
    (the extra literal column perturbs the hash), folded into [0, m).

    ``portable=True`` swaps the base hash for the engine-portable
    md5_long over ``key || ':' || i`` (dedup.md5_long), so a DuckDB
    oracle reproduces every position bit-for-bit:
    ``CAST(concat('0x', substr(md5(concat(key, ':', i)), 1, 15)) AS
    BIGINT) % m``. md5_long is non-negative (60 bits), so pmod == %."""
    if portable:
        from xngin_spark.operators.dedup import md5_long

        return [
            F.pmod(
                md5_long(F.concat(col, F.lit(":"), F.lit(str(i)))),
                F.lit(m_bits),
            )
            for i in range(k)
        ]
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int, k: int, portable: bool = False
) -> DataFrame:
    """Aggregate ``keys[key_col]`` into a Bloom filter, returned as a
    DataFrame of (word: long, bits: long) — only words with at least one
    set bit are present (the filter is sparse-represented; a missing
    word means all-zero)."""
    col = F.col(key_col)
    bits = F.array(*_bit_positions(col, m_bits, k, portable))
    return (
        keys.select(F.explode_outer(bits).alias("bit"))
        .filter(F.col("bit").isNotNull())
        .select(
            (F.col("bit") / _WORD_BITS).cast("long").alias("word"),
            # shiftleft's python binding takes a literal count; the SQL
            # form accepts an expression
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(bit, {_WORD_BITS}) AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int,
    k: int,
    out_col: str = "might_contain",
    portable: bool = False,
) -> DataFrame:
    """Append ``out_col``: True iff all k bits for ``df[key_col]`` are
    set in ``bloom``. k broadcast joins on the word index — map-side
    only (no shuffle, no explode/regroup of the probe side); a word
    absent from the sparse filter reads as all-zero via the left join's
    NULL. ``fan_out`` spreads an underparallel probe input (and no-ops
    on a real multi-split scan), so the k probe stages never run
    single-task on a small or badly-packed source."""
    from xngin_spark.operators.util import fan_out

    out = fan_out(df)
    positions = _bit_positions(F.col(key_col), m_bits, k, portable)
    hit_cols = []
    for i, pos in enumerate(positions):
        w, b, p = f"_bw{i}", f"_bb{i}", f"_bp{i}"
        probe = bloom.select(
            F.col("word").alias(w), F.col("bits").alias(b)
        )
        out = (
            out.withColumn(p, pos)
            .withColumn(w, (F.col(p) / _WORD_BITS).cast("long"))
            .join(F.broadcast(probe), on=w, how="left")
        )
        hit = (
            F.coalesce(F.col(b), F.lit(0).cast("long")).bitwiseAND(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({p}, {_WORD_BITS}) AS INT))"
                )
            )
            != 0
        )
        hit_cols.append(hit)
    verdict = hit_cols[0]
    for h in hit_cols[1:]:
        verdict = verdict & h
    keep = [c for c in df.columns]
    return out.select(*keep, verdict.alias(out_col))
