"""Z-order data layout: multi-column clustering for row-group skipping.

Sorting by a single column gives parquet min/max pruning on that column
only; interleaving the bits of several key columns (Morton order) keeps
rows that are close in ANY key dimension physically close, so
row-group statistics stay narrow for every interleaved column at once
and selective filters on any of them skip most of the file.

This is the open-format analog of the reference's zone-map block
skipping (SURVEY §2.6 — its storage engine keeps per-block min/max),
generalized to multiple dimensions, and the same layout trick Delta's
OPTIMIZE ZORDER applies. All JVM bit arithmetic — the z-value is one
codegen'd expression, the write is an ordinary range-partitioned sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16


def _clamped(col: Column, bits: int) -> Column:
    """Clamp to [0, 2^bits) — z-ordering needs a bounded non-negative
    key; callers pre-scale real domains (e.g. epoch-hour, id mod)."""
    return F.greatest(F.lit(0), F.least(col.cast("long"), F.lit((1 << bits) - 1)))


def zorder_value(cols: Sequence[Column]) -> Column:
    """Morton z-value: interleave the low bits of each column. For m
    columns, bit i of column j lands at position i*m + j.

    Bits per column shrink as columns grow — ``min(Z_BITS, 63 // m)`` —
    so the top interleaved bit never reaches position 63 (the long sign
    bit: affected rows would sort FIRST) and never wraps past 64 (JVM
    shiftleft is mod-64: bits would silently interleave wrong). At m=4
    that is 15 bits/col; clustering quality degrades gracefully instead
    of the ordering invariant breaking."""
    m = len(cols)
    if m == 0:
        raise ValueError("zorder_value needs at least one column")
    bits = min(Z_BITS, 63 // m)
    clamped = [_clamped(c, bits) for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(clamped):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * m + j)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[Column],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the z-value of ``cols``:
    range-partition on z (each output file owns a contiguous z-range,
    cluster-parallel), sort within partitions, drop the helper column.
    Readers filtering on ANY of the interleaved columns then skip
    files/row-groups via ordinary parquet min/max stats."""
    z = zorder_value(cols).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
