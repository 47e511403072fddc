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

from pyspark.sql import Column, DataFrame, SparkSession
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


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    small_threshold: float = 0.5,
) -> dict[str, int]:
    """Bin-pack small parquet files into ~``target_bytes`` outputs —
    the OPTIMIZE/compaction step every long-lived table needs: streaming
    sinks, frequent MERGEs and partitioned writes all accrete files far
    below the scan-efficient size, and at 100 TB the resulting
    per-file open/footer/task overhead dominates scan cost long before
    data volume does.

    Files >= ``small_threshold * target_bytes`` are already healthy and
    are left byte-identical on disk (inode-stable, like the CoW DML
    path rewrites only affected files); the small ones are read in one
    distributed job and rewritten as ceil(total_small / target) files.
    Listing is driver-side metadata (one os.stat per file); data moves
    once, shuffle-free (coalesce, not repartition).

    Returns {"files_before", "files_compacted", "files_written"}.
    """
    import math
    import os

    from xngin_spark.sources.dml import _swap_in

    root = path.removeprefix("file://").removeprefix("file:")
    all_files = [
        os.path.join(root, f)
        for f in os.listdir(root)
        if f.endswith(".parquet") and not f.startswith(".")
    ]
    small = [f for f in all_files if os.stat(f).st_size < small_threshold * target_bytes]
    if len(small) < 2:
        return {
            "files_before": len(all_files),
            "files_compacted": 0,
            "files_written": 0,
        }
    total = sum(os.stat(f).st_size for f in small)
    n_out = max(1, math.ceil(total / target_bytes))
    merged = spark.read.parquet(*small).coalesce(n_out)
    _swap_in(spark, merged, path, small)
    return {
        "files_before": len(all_files),
        "files_compacted": len(small),
        "files_written": n_out,
    }


def optimize_table(
    spark: SparkSession,
    path: str,
    zorder_cols: Sequence[str] | None = None,
    target_bytes: int = 128 << 20,
    small_threshold: float = 0.5,
) -> dict[str, int]:
    """OPTIMIZE [ZORDER BY ...] — the lakehouse maintenance op as one
    call: bin-pack small files, and when ``zorder_cols`` is given,
    rewrite the COMPACTED bytes z-order-clustered so multi-column
    filters skip files/row-groups via parquet min/max stats.

    Only files below the health threshold are ever touched — healthy
    files stay byte-identical (inode-stable) whether or not z-ordering
    is requested, so repeated maintenance passes are no-ops and cost is
    proportional to the small-file debt, not table size. With
    ``zorder_cols`` the small set is rewritten through one
    range-partition-by-z + local sort (one shuffle of the affected
    bytes); without, it is a shuffle-free coalesce.

    Returns compact_small_files' counters plus {"zordered": 0/1}.
    """
    import math
    import os

    from pyspark.sql import functions as F

    from xngin_spark.sources.dml import _swap_in

    if not zorder_cols:
        stats = compact_small_files(spark, path, target_bytes, small_threshold)
        stats["zordered"] = 0
        return stats

    root = path.removeprefix("file://").removeprefix("file:")
    all_files = [
        os.path.join(root, f)
        for f in os.listdir(root)
        if f.endswith(".parquet") and not f.startswith(".")
    ]
    small = [
        f for f in all_files if os.stat(f).st_size < small_threshold * target_bytes
    ]
    if len(small) < 2:
        return {
            "files_before": len(all_files),
            "files_compacted": 0,
            "files_written": 0,
            "zordered": 0,
        }
    total = sum(os.stat(f).st_size for f in small)
    n_out = max(1, math.ceil(total / target_bytes))
    z = zorder_value([F.col(c) for c in zorder_cols]).alias("__z")
    merged = (
        spark.read.parquet(*small)
        .withColumn("__z", z)
        .repartitionByRange(n_out, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    _swap_in(spark, merged, path, small)
    return {
        "files_before": len(all_files),
        "files_compacted": len(small),
        "files_written": n_out,
        "zordered": 1,
    }


def auto_compact(
    spark: SparkSession,
    path: str,
    max_files: int = 32,
    target_bytes: int = 128 << 20,
) -> dict[str, int]:
    """Threshold-gated compaction for MAINTAINED datasets — the
    small-file-debt bound for the incremental index family. Every
    scrub-then-append update cycle appends delta-sized files; N cycles
    grow the file count until per-file open/footer/task overhead
    dominates probe cost. This wires ``compact_small_files`` into the
    maintenance path itself: a no-op (pure driver-side listing) while
    the dataset is healthy, one bin-pack of the small files once a
    directory crosses ``max_files``.

    Handles both layouts the indexes use: a flat parquet dir (BM25
    postings/doclen/termstats, MinHash signatures/bands) compacts at
    the root; a one-level hive-partitioned dir (IVF's ivf_list=K)
    compacts each PARTITION directory that crosses the threshold —
    probes read single partitions, so the bound that matters is
    files-per-partition. Returns aggregate compaction counters.

    Crash note: compaction runs strictly AFTER the owning update's
    commit point and rewrites only sub-threshold files via the CoW
    swap; a process crash mid-swap can duplicate small-file rows until
    the next compaction pass (the _swap_in window every CoW DML op in
    this repo shares) — maintenance crash-safety of the update itself
    is unaffected because replays skip committed batches without
    re-entering compaction.
    """
    import os

    root = path.removeprefix("file://").removeprefix("file:")
    if not os.path.isdir(root):
        return {"files_before": 0, "files_compacted": 0, "files_written": 0}
    part_dirs = [
        os.path.join(root, d)
        for d in os.listdir(root)
        if "=" in d and os.path.isdir(os.path.join(root, d))
    ]
    targets = part_dirs or [root]
    agg = {"files_before": 0, "files_compacted": 0, "files_written": 0}
    for t in targets:
        n = sum(
            1
            for f in os.listdir(t)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        agg["files_before"] += n
        if n <= max_files:
            continue
        stats = compact_small_files(spark, t, target_bytes=target_bytes)
        agg["files_compacted"] += stats["files_compacted"]
        agg["files_written"] += stats["files_written"]
    return agg
